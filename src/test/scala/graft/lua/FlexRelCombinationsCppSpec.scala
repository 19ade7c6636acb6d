package graft.lua

import graft.SparkSpecBase

/** Ports of tests/test-output-flex-relation-combinations.cpp (shared
  * member-way add/remove/change across two relations) and
  * tests/test-output-flex-multi-input.cpp (k-way merged input files
  * with newest-version-per-id), both over the reference's own
  * configs and the real append flow. */
class FlexRelCombinationsCppSpec extends SparkSpecBase {

  private val combiConf = "test_output_flex_relation_combinations.lua"
  private val rels = "osm2pgsql_test_relations"

  private def combiCheck(db: FlexCppHarness): Unit = {
    assert(db.count(rels) == 2)
    assert(db.count(rels, "relation_id = 30") == 1)
    assert(db.count(rels, "relation_id = 31") == 1)
  }

  test("adding common way to relation") {
    val db = new FlexCppHarness(spark, combiConf)
    db.runImport(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV x10.0 y10.1\n" +
      "n12 v1 dV x10.1 y10.1\n" +
      "n13 v1 dV x10.1 y10.0\n" +
      "w20 v1 dV Nn10,n11\n" +
      "w21 v1 dV Nn12,n13\n" +
      "r30 v1 dV Ta=b Mw20@\n" +
      "r31 v1 dV Ta=b Mw21@\n", append = false)
    combiCheck(db)
    db.runImport("r31 v2 dV Ta=b Mw20@,w21@\n", append = true)
    combiCheck(db)
  }

  test("remove common way from relation") {
    val db = new FlexCppHarness(spark, combiConf)
    db.runImport(
      "w20 v1 dV Nn10,n11\n" +
      "w21 v1 dV Nn12,n13\n" +
      "r30 v1 dV Ta=b Mw20@\n" +
      "r31 v1 dV Ta=b Mw20@,w21@\n", append = false)
    combiCheck(db)
    db.runImport("r31 v2 dV Ta=b Mw21@\n", append = true)
    combiCheck(db)
  }

  test("change common way in relation") {
    val db = new FlexCppHarness(spark, combiConf)
    db.runImport(
      "w20 v1 dV Nn10,n11\n" +
      "w21 v1 dV Nn12,n13\n" +
      "r30 v1 dV Ta=b Mw20@\n" +
      "r31 v1 dV Ta=b Mw20@,w21@\n", append = false)
    combiCheck(db)
    db.runImport("r31 v2 dV Ta=c Mw20@,w21@\n", append = true)
    combiCheck(db)
  }

  // ---- test-output-flex-multi-input.cpp ----

  private val flexConf = "test_output_flex.lua"
  private val point = "osm2pgsql_test_point"
  private val line = "osm2pgsql_test_line"

  test("with three input files") {
    val db = new FlexCppHarness(spark, flexConf)
    db.runImportFiles(Seq(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV x10.0 y10.2\n" +
      "w20 v1 dV Thighway=primary Nn10,n11,n12\n",
      "n12 v1 dV x10.2 y10.2\n" +
      "w21 v1 dV Thighway=secondary Nn12,n10\n",
      "n13 v1 dV x11.0 y11.0 Tamenity=postbox\n"))
    assert(db.count(point) == 1)
    assert(db.count(line) == 2)
    assert(db.count(line, "tags['highway'] = 'primary'") == 1)
    assert(db.count(line, "tags['highway'] = 'secondary'") == 1)
    assert(db.count(line, "st_numpoints(geom) = 3") == 1)
    assert(db.count(line, "st_numpoints(geom) = 2") == 1)
    db.runImport("n10 v2 dV x11.0 y11.0\n", append = true)
    assert(db.count(point) == 1)
    assert(db.count(line) == 2)
    assert(db.count(line, "st_numpoints(geom) = 3") == 1)
    assert(db.count(line, "st_numpoints(geom) = 2") == 1)
  }

  test("should use newest version of any object") {
    val db = new FlexCppHarness(spark, flexConf)
    db.runImportFiles(Seq(
      "n10 v1 dV x10.0 y10.0 Ta=10.1\n" +
      "n11 v1 dV x10.1 y10.1 Ta=11.1\n" +
      "n12 v1 dV x10.2 y10.2 Ta=12.1\n",
      "n13 v2 dV x10.3 y10.3 Ta=13.2\n",
      "n10 v1 dV x10.0 y10.0 Ta=10.1\n" +
      "n11 v2 dV x10.1 y10.2 Ta=11.2\n" +
      "n13 v1 dV x10.3 y10.3 Ta=13.1\n"))
    assert(db.count(point) == 4)
    assert(db.count(point, "tags['a'] = '10.1'") == 1) // both the same
    assert(db.count(point, "tags['a'] = '11.2'") == 1)
    assert(db.count(point, "tags['a'] = '12.1'") == 1) // only one
    assert(db.count(point, "tags['a'] = '13.2'") == 1)
  }
}
