package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-nodes.cpp over the reference's own
  * `test_output_flex_nodes.lua`: node add/change/delete through the
  * append flow, each change case run with the node standing alone, in
  * a way, and in a relation (the C++ TEMPLATE_TEST_CASE axis) — the
  * membership variants prove the dependency closure does not corrupt
  * unrelated node rows. */
class FlexNodesCppSpec extends SparkSpecBase {

  private val conf = "test_output_flex_nodes.lua"
  private val t1 = "osm2pgsql_test_t1"
  private val t2 = "osm2pgsql_test_t2"

  private val base7 =
    "n10 v1 dV x10.0 y10.0\n" +
    "n11 v1 dV Tt1=yes x10.0 y10.1\n" +
    "n12 v1 dV Tt2=yes x10.0 y10.2\n" +
    "n13 v1 dV Tt1=yes,t2=yes x10.0 y10.2\n" +
    "n14 v1 dV x11.0 y10.0\n" +
    "n15 v1 dV Tt1=yes x11.0 y10.1\n" +
    "n16 v1 dV Tt1=yes,t2=yes x11.0 y10.2\n"

  private val memberships = Seq(
    "none" -> None,
    "in_way" -> Some("w20 v1 dV Nn14,n15,n16\n"),
    "in_relation" -> Some("r30 v1 dV Mn14@,n15@,n16@\n"))

  private def setUp(membership: Option[String]): FlexCppHarness = {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(base7, append = false)
    membership.foreach(m => db.runImport(m, append = true))
    assert(db.count(t1) == 4)
    assert(db.count(t2) == 3)
    Seq(11, 13, 15, 16).foreach(id =>
      assert(db.count(t1, s"node_id = $id") == 1))
    db
  }

  test("add nodes") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV Tt1=yes x10.0 y10.1\n" +
      "n12 v1 dV Tt2=yes x10.0 y10.2\n" +
      "n13 v1 dV Tt1=yes,t2=yes x10.0 y10.2\n", append = false)
    assert(db.count(t1) == 2)
    assert(db.count(t2) == 2)
    assert(db.count(t1, "node_id = 11") == 1)
    assert(db.count(t1, "node_id = 13") == 1)
    db.runImport(
      "n14 v1 dV x11.0 y10.0\n" +
      "n15 v1 dV Tt1=yes x11.0 y10.1\n" +
      "n16 v1 dV Tt2=yes x11.0 y10.2\n" +
      "n17 v1 dV Tt1=yes,t2=yes x11.0 y10.2\n", append = true)
    assert(db.count(t1) == 4)
    assert(db.count(t2) == 4)
    Seq(11, 13, 15, 17).foreach(id =>
      assert(db.count(t1, s"node_id = $id") == 1))
  }

  // (change data, expected t1 count, expected t2 count)
  private val changeCases = Seq(
    ("no tag, add tag t1", "n14 v2 dV Tt1=yes x11.0 y10.0\n", 5, 3),
    ("no tag, add tag t1, t2", "n14 v2 dV Tt1=yes,t2=yes x11.0 y10.0\n",
      5, 4),
    ("one tag, remove tag t1", "n15 v2 dV x11.0 y10.0\n", 3, 3),
    ("one tag, change tag t1 to t2", "n15 v2 dV Tt2=yes x11.0 y10.0\n",
      3, 4),
    ("one tag, add tag t2", "n15 v2 dV Tt1=yes,t2=yes x11.0 y10.0\n",
      4, 4),
    ("two tags, remove tag t1 and t2", "n16 v2 dV x11.0 y10.0\n", 3, 2),
    ("two tags, remove only tag t1 not t2",
      "n16 v2 dV Tt2=yes x11.0 y10.0\n", 3, 3))

  memberships.foreach { case (mName, membership) =>
    test(s"change nodes ($mName)") {
      changeCases.foreach { case (what, change, c1, c2) =>
        val db = setUp(membership)
        db.runImport(change, append = true)
        assert(db.count(t1) == c1, s"t1 after '$what'")
        assert(db.count(t2) == c2, s"t2 after '$what'")
      }
    }

    test(s"delete nodes ($mName)") {
      val db = setUp(membership)
      db.runImport("n14 v2 dD\nn15 v2 dD\nn16 v2 dD\n", append = true)
      assert(db.count(t1) == 2)
      assert(db.count(t2) == 2)
    }
  }
}
