package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-stage2.cpp over the reference's
  * `test_output_flex_stage2.lua`: the two-stage (select_relation_
  * members + w2r state) config through the full update flow —
  * relation data lands on member-way rows, and relation/way/node
  * changes propagate through marks, the stage-1c marks-only replay,
  * and delete-then-insert. */
class FlexStage2CppSpec extends SparkSpecBase {

  private val conf = "test_output_flex_stage2.lua"
  private val hw = "osm2pgsql_test_highways"
  private val rt = "osm2pgsql_test_routes"

  private val sixNodes =
    "n10 v1 dV x10.0 y10.0\n" +
    "n11 v1 dV x10.0 y10.2\n" +
    "n12 v1 dV x10.2 y10.2\n" +
    "n13 v1 dV x10.2 y10.0\n" +
    "n14 v1 dV x10.3 y10.0\n" +
    "n15 v1 dV x10.4 y10.0\n"

  test("nodes and ways") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(sixNodes +
      "w20 v1 dV Thighway=primary Nn10,n11,n12\n" +
      "w21 v1 dV Thighway=secondary Nn12,n13\n", append = false)
    assert(db.count(hw) == 2)
    assert(db.count(rt) == 0)
    assert(db.count(hw, "tags['highway'] = 'primary'") == 1)
    assert(db.count(hw, "tags['highway'] = 'secondary'") == 1)
    assert(db.count(hw, "st_astext(geom) = " +
      "'LINESTRING(10 10,10 10.2,10.2 10.2)'") == 1)
    assert(db.count(hw,
      "st_astext(geom) = 'LINESTRING(10.2 10.2,10.2 10)'") == 1)
    // move a node
    db.runImport("n11 v2 dV x10.0 y10.3\n", append = true)
    assert(db.count(hw) == 2)
    assert(db.count(hw, "st_astext(geom) = " +
      "'LINESTRING(10 10,10 10.3,10.2 10.2)'") == 1)
    assert(db.count(hw,
      "st_astext(geom) = 'LINESTRING(10.2 10.2,10.2 10)'") == 1)
    // delete a node, shrink both ways (w21 to a single node!)
    db.runImport(
      "n12 v2 dD\n" +
      "w20 v2 dV Thighway=primary Nn10,n11\n" +
      "w21 v2 dV Thighway=secondary Nn13\n", append = true)
    assert(db.count(hw) == 1)
    assert(db.count(hw, "tags['highway'] = 'primary'") == 1)
    assert(db.count(hw, "tags['highway'] = 'secondary'") == 0)
    assert(db.count(hw,
      "st_astext(geom) = 'LINESTRING(10 10,10 10.3)'") == 1)
    // restore w21 with valid nodes
    db.runImport("w21 v2 dV Thighway=secondary Nn13,n14,n15\n",
      append = true)
    assert(db.count(hw) == 2)
    assert(db.count(hw,
      "st_astext(geom) = 'LINESTRING(10 10,10 10.3)'") == 1)
    assert(db.count(hw, "st_astext(geom) = " +
      "'LINESTRING(10.2 10,10.3 10,10.4 10)'") == 1)
  }

  private val threeWays = sixNodes +
    "w20 v1 dV Thighway=primary Nn10,n11,n12\n" +
    "w21 v1 dV Thighway=secondary Nn12,n13\n" +
    "w22 v1 dV Thighway=secondary Nn13,n14,n15\n"

  private def checkBase(db: FlexCppHarness, routes: Int = 1): Unit = {
    assert(db.count(hw) == 3)
    assert(db.count(rt) == routes)
    assert(db.count(hw, "tags['highway'] = 'primary'") == 1)
    assert(db.count(hw, "tags['highway'] = 'secondary'") == 2)
  }

  test("relation data on ways") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(threeWays +
      "r30 v1 dV Ttype=route,ref=X11 Mw20@,w21@\n", append = false)
    checkBase(db)
    assert(db.count(hw, "refs = 'X11'") == 2)
    assert(db.count(hw, "refs IS NULL") == 1)
    assert(db.count(rt, "members = '20,21'") == 1)
    // move node in way in the relation
    db.runImport("n11 v2 dV x10.0 y10.1\n", append = true)
    checkBase(db)
    assert(db.count(hw, "refs = 'X11'") == 2)
    assert(db.count(hw, "refs IS NULL") == 1)
    assert(db.count(rt, "members = '20,21'") == 1)
    // add the third way to the relation
    db.runImport("r30 v2 dV Ttype=route,ref=X11 Mw20@,w21@,w22@\n",
      append = true)
    checkBase(db)
    assert(db.count(hw, "refs = 'X11'") == 3)
    assert(db.count(hw, "refs IS NULL") == 0)
    assert(db.count(rt, "members = '20,21,22'") == 1)
    // remove the second way from the relation and delete it
    db.runImport("w21 v2 dD\n" +
      "r30 v3 dV Ttype=route,ref=X11 Mw20@,w22@\n", append = true)
    assert(db.count(hw) == 2)
    assert(db.count(rt) == 1)
    assert(db.count(hw, "tags['highway'] = 'primary'") == 1)
    assert(db.count(hw, "tags['highway'] = 'secondary'") == 1)
    assert(db.count(hw, "refs = 'X11'") == 2)
    assert(db.count(hw, "refs IS NULL") == 0)
    assert(db.count(rt, "members = '20,22'") == 1)
    // delete the relation, leaving two ways
    db.runImport("r30 v4 dD\n", append = true)
    assert(db.count(hw) == 2)
    assert(db.count(rt) == 0)
    assert(db.count(hw, "refs = 'X11'") == 0)
    assert(db.count(hw, "refs IS NULL") == 2)
  }

  test("relation data on ways: delete or re-tag relation") {
    Seq("r30 v2 dD\n",
        "r30 v2 dV Ttype=foo Mw20@,w21@\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport(threeWays +
        "r30 v1 dV Ttype=route,ref=X11 Mw20@,w21@\n", append = false)
      checkBase(db)
      assert(db.count(hw, "refs = 'X11'") == 2)
      assert(db.count(hw, "refs IS NULL") == 1)
      db.runImport(change, append = true)
      checkBase(db, routes = 0)
      assert(db.count(hw, "refs = 'X11'") == 0)
      assert(db.count(hw, "refs IS NULL") == 3)
      assert(db.count(rt, "members = '20,21'") == 0)
    }
  }

  test("relation data on ways: delete way in other relation") {
    Seq("w20 v2 dV Thighway=primary Nn10,n11\n",
        "w20 v2 dV Thighway=primary,name=foo Nn10,n11,n12\n",
        "n10 v2 dV x11.0 y10.0\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport(threeWays +
        "r30 v1 dV Ttype=no-route Mw20@,w21@\n" +
        "r31 v1 dV Ttype=route,ref=X11 Mw21@,w22@\n", append = false)
      checkBase(db)
      assert(db.count(hw, "refs = 'X11'") == 2)
      assert(db.count(hw, "refs IS NULL") == 1)
      assert(db.count(rt, "members = '20,21'") == 0)
      assert(db.count(rt, "members = '21,22'") == 1)
      db.runImport(change, append = true)
      checkBase(db)
      assert(db.count(hw, "refs = 'X11'") == 2)
      assert(db.count(hw, "refs IS NULL") == 1)
      assert(db.count(rt, "members = '20,21'") == 0)
      assert(db.count(rt, "members = '21,22'") == 1)
    }
  }

  test("changing things in one relation should not change output") {
    Seq("r30 v2 dV Ttype=route,ref=Y11 Mw20@,w21@\n",
        "w20 v2 dV Thighway=primary Nn10,n11\n",
        "w20 v2 dV Thighway=primary,name=foo Nn10,n11,n12\n",
        "n10 v2 dV x11.0 y10.0\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport(threeWays +
        "r30 v1 dV Ttype=route,ref=Y11 Mw20@,w21@\n" +
        "r31 v1 dV Ttype=route,ref=X11 Mw21@,w22@\n", append = false)
      checkBase(db, routes = 2)
      assert(db.count(hw, "refs = 'X11'") == 1)
      assert(db.count(hw, "refs = 'Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Y11'") == 1)
      assert(db.count(rt, "members = '20,21'") == 1)
      assert(db.count(rt, "members = '21,22'") == 1)
      db.runImport(change, append = true)
      checkBase(db, routes = 2)
      assert(db.count(hw, "refs = 'X11'") == 1)
      assert(db.count(hw, "refs = 'Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Y11'") == 1)
      assert(db.count(rt, "members = '20,21'") == 1)
      assert(db.count(rt, "members = '21,22'") == 1)
    }
  }

  test("change relation (two rels)") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(threeWays +
      "r30 v1 dV Ttype=route,ref=Y11 Mw20@,w21@\n" +
      "r31 v1 dV Ttype=route,ref=X11 Mw21@,w22@\n", append = false)
    checkBase(db, routes = 2)
    assert(db.count(hw, "refs = 'X11'") == 1)
    assert(db.count(hw, "refs = 'Y11'") == 1)
    assert(db.count(hw, "refs = 'X11,Y11'") == 1)
    db.runImport("r30 v2 dV Ttype=route,ref=Z11 Mw20@,w21@\n",
      append = true)
    checkBase(db, routes = 2)
    assert(db.count(hw, "refs = 'X11'") == 1)
    assert(db.count(hw, "refs = 'Z11'") == 1)
    assert(db.count(hw, "refs = 'X11,Z11'") == 1)
    assert(db.count(rt, "members = '20,21'") == 1)
    assert(db.count(rt, "members = '21,22'") == 1)
  }

  test("change relation (three rels)") {
    Seq("w20 v2 dV Thighway=primary Nn10,n11\n",
        "w20 v2 dV Thighway=primary,name=foo Nn10,n11,n12\n",
        "n10 v2 dV x11.0 y10.0\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport(threeWays +
        "r30 v1 dV Ttype=route,ref=Y11 Mw20@,w21@\n" +
        "r31 v1 dV Ttype=route,ref=X11 Mw21@,w22@\n" +
        "r32 v1 dV Ttype=route,ref=Z11 Mw22@\n", append = false)
      checkBase(db, routes = 3)
      assert(db.count(hw, "refs = 'Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Z11'") == 1)
      db.runImport(change, append = true)
      checkBase(db, routes = 3)
      assert(db.count(hw, "refs = 'Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Y11'") == 1)
      assert(db.count(hw, "refs = 'X11,Z11'") == 1)
      assert(db.count(hw, "refs = 'X11'") == 0)
      assert(db.count(rt, "members = '20,21'") == 1)
      assert(db.count(rt, "members = '21,22'") == 1)
      assert(db.count(rt, "members = '22'") == 1)
    }
  }

  test("delete relation (alt config)") {
    val db = new FlexCppHarness(spark, "test_output_flex_stage2_alt.lua")
    db.runImport(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV x10.0 y10.2\n" +
      "n12 v1 dV x10.2 y10.2\n" +
      "w20 v1 dV Thighway=primary Nn10,n11,n12\n" +
      "r30 v1 dV Ttype=route,ref=Y11 Mw20@\n" +
      "r31 v1 dV Ttype=something Mw20@\n", append = false)
    assert(db.count(hw) == 1)
    assert(db.count(rt) == 1)
    assert(db.count(hw, "refs = 'Y11'") == 1)
    // delete the non-route relation: the route data must survive
    db.runImport("r31 v2 dD\n", append = true)
    assert(db.count(hw) == 1)
    assert(db.count(rt) == 1)
    assert(db.count(hw, "refs = 'Y11'") == 1)
  }
}
