package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-relations.cpp over the reference's
  * `test_output_flex_relations.lua`: relation add/change/delete
  * through the append flow (tag-membership transitions between two
  * relation tables). */
class FlexRelationsCppSpec extends SparkSpecBase {

  private val conf = "test_output_flex_relations.lua"
  private val t1 = "osm2pgsql_test_t1"
  private val t2 = "osm2pgsql_test_t2"

  private val base7 =
    "r30 v1 dV\n" +
    "r31 v1 dV Tt1=yes\n" +
    "r32 v1 dV Tt2=yes\n" +
    "r33 v1 dV Tt1=yes,t2=yes\n" +
    "r34 v1 dV\n" +
    "r35 v1 dV Tt1=yes\n" +
    "r36 v1 dV Tt1=yes,t2=yes\n"

  private def setUp(): FlexCppHarness = {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(base7, append = false)
    assert(db.count(t1) == 4)
    assert(db.count(t2) == 3)
    Seq(31, 33, 35, 36).foreach(id =>
      assert(db.count(t1, s"relation_id = $id") == 1))
    db
  }

  test("add relations") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "r30 v1 dV\n" +
      "r31 v1 dV Tt1=yes\n" +
      "r32 v1 dV Tt2=yes\n" +
      "r33 v1 dV Tt1=yes,t2=yes\n", append = false)
    assert(db.count(t1) == 2)
    assert(db.count(t2) == 2)
    assert(db.count(t1, "relation_id = 31") == 1)
    assert(db.count(t1, "relation_id = 33") == 1)
    db.runImport(
      "r34 v1 dV\n" +
      "r35 v1 dV Tt1=yes\n" +
      "r36 v1 dV Tt2=yes\n" +
      "r37 v1 dV Tt1=yes,t2=yes\n", append = true)
    assert(db.count(t1) == 4)
    assert(db.count(t2) == 4)
    Seq(31, 33, 35, 37).foreach(id =>
      assert(db.count(t1, s"relation_id = $id") == 1))
  }

  test("change relations") {
    Seq(
      ("no tag, add tag t1", "r34 v2 dV Tt1=yes\n", 5, 3),
      ("no tag, add tag t1, t2", "r34 v2 dV Tt1=yes,t2=yes\n", 5, 4),
      ("one tag, remove tag t1", "r35 v2 dV\n", 3, 3),
      ("one tag, change tag t1 to t2", "r35 v2 dV Tt2=yes\n", 3, 4),
      ("one tag, add tag t2", "r35 v2 dV Tt1=yes,t2=yes\n", 4, 4),
      ("two tags, remove tag t1 and t2", "r36 v2 dV\n", 3, 2),
      ("two tags, remove only tag t1 not t2", "r36 v2 dV Tt2=yes\n",
        3, 3)
    ).foreach { case (what, change, c1, c2) =>
      val db = setUp()
      db.runImport(change, append = true)
      assert(db.count(t1) == c1, s"t1 after '$what'")
      assert(db.count(t2) == c2, s"t2 after '$what'")
    }
  }

  test("delete relation") {
    val db = setUp()
    db.runImport("r34 v2 dD\nr35 v2 dD\nr36 v2 dD\n", append = true)
    assert(db.count(t1) == 2)
    assert(db.count(t2) == 2)
  }
}
