package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-update.cpp: the reference's
  * update-flow assertions over its own `test_output_flex.lua` config,
  * run through the real Lua runtime + [[graft.flex.FlexRunner.append]].
  * The C++ file templates each case over slim-default / slim-expire /
  * slim-schema options; expire zoom and db schema are PG-side-only
  * concerns here, so each case runs once (the slim-default variant).
  * Catch2 SECTIONs replay the common prefix per branch, mirrored as
  * separate harness sequences. */
class FlexUpdateCppSpec extends SparkSpecBase {

  private val conf = "test_output_flex.lua"
  private val point = "osm2pgsql_test_point"
  private val line = "osm2pgsql_test_line"
  private val polygon = "osm2pgsql_test_polygon"

  // test-output-flex-update.cpp:84-117 "updating a node"
  test("updating a node: tag added then removed / deleted") {
    Seq("n10 v3 dV x10 y10\n", "n10 v3 dD\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      // import an untagged node: no row
      db.runImport("n10 v1 dV x10 y10\n", append = false)
      assert(db.count(point) == 0)
      // give the node a tag...
      db.runImport("n10 v2 dV x10 y10 Tamenity=restaurant\n",
        append = true)
      assert(db.count(point) == 1)
      assert(db.count(point,
        "node_id = 10 AND tags['amenity'] = 'restaurant'") == 1)
      // SECTION: remove the tag / delete the node
      db.runImport(change, append = true)
      assert(db.count(point) == 0)
    }
  }

  // test-output-flex-update.cpp:119-174 "updating a way"
  test("updating a way: tags, node moves, node list, delete") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "n10 v1 dV x10.0 y10.1\n" +
      "n11 v1 dV x10.1 y10.2\n" +
      "w20 v1 dV Thighway=primary Nn10,n11\n", append = false)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = 'primary' " +
      "AND st_numpoints(geom) = 2") == 1)
    // now change the way itself...
    db.runImport("w20 v2 dV Thighway=secondary Nn10,n11\n", append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = " +
      "'secondary' AND st_numpoints(geom) = 2") == 1)
    // now change a node in the way...
    db.runImport("n10 v2 dV x10.0 y10.3\n", append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = " +
      "'secondary' AND st_numpoints(geom) = 2") == 1)
    // now add a node to the way...
    db.runImport("n12 v1 dV x10.2 y10.1\n" +
      "w20 v3 dV Thighway=residential Nn10,n11,n12\n", append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = " +
      "'residential' AND st_numpoints(geom) = 3") == 1)
    // now delete the way...
    db.runImport("w20 v4 dD\n", append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 0)
  }

  // test-output-flex-update.cpp:176-246 "ways as linestrings and polygons"
  test("ways flip between line and polygon tables on update") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV x10.0 y10.2\n" +
      "n12 v1 dV x10.2 y10.2\n" +
      "n13 v1 dV x10.2 y10.0\n" +
      "w20 v1 dV Tbuilding=yes Nn10,n11,n12,n13,n10\n", append = false)
    assert(db.count(point) == 0)
    assert(db.count(line) == 0)
    assert(db.count(polygon) == 1)
    assert(db.count(polygon, "osm_id = 20 AND tags['building'] = 'yes' " +
      "AND st_geometrytype(geom) = 'ST_Polygon'") == 1)
    // now change the way tags: linear tag -> line table
    db.runImport("w20 v2 dV Thighway=secondary Nn10,n11,n12,n13,n10\n",
      append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = " +
      "'secondary' AND st_geometrytype(geom) = 'ST_LineString'") == 1)
    assert(db.count(polygon) == 0)
    // now remove a node from the way...
    db.runImport("w20 v3 dV Thighway=secondary Nn10,n11,n12,n13\n",
      append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 1)
    assert(db.count(line, "osm_id = 20 AND tags['highway'] = " +
      "'secondary' AND st_geometrytype(geom) = 'ST_LineString'") == 1)
    assert(db.count(polygon) == 0)
    // area tag on an UNCLOSED way: nothing lands anywhere
    db.runImport("w20 v4 dV Tbuilding=yes Nn10,n11,n12,n13\n",
      append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 0)
    assert(db.count(polygon) == 0)
    // close the way again -> polygon
    db.runImport("w20 v5 dV Tbuilding=yes Nn10,n11,n12,n13,n10\n",
      append = true)
    assert(db.count(point) == 0)
    assert(db.count(line) == 0)
    assert(db.count(polygon) == 1)
    assert(db.count(polygon, "osm_id = 20 AND tags['building'] = 'yes' " +
      "AND st_geometrytype(geom) = 'ST_Polygon'") == 1)
  }

  // test-output-flex-update.cpp:248-301 "multipolygons"
  test("multipolygon relation updates and removal") {
    Seq("r30 v3 dD\n",
        "r30 v3 dV Tbuilding=yes,name=Shed Mw20@\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport(
        "n10 v1 dV x10.0 y10.0\n" +
        "n11 v1 dV x10.0 y10.2\n" +
        "n12 v1 dV x10.2 y10.2\n" +
        "n13 v1 dV x10.2 y10.0\n" +
        "w20 v1 dV Nn10,n11,n12,n13,n10\n" +
        "r30 v1 dV Ttype=multipolygon,building=yes Mw20@\n",
        append = false)
      assert(db.count(point) == 0)
      assert(db.count(line) == 0)
      assert(db.count(polygon) == 1)
      assert(db.count(polygon, "osm_id = -30 AND tags['building'] = " +
        "'yes' AND st_geometrytype(geom) = 'ST_Polygon'") == 1)
      // change tags on that relation...
      db.runImport(
        "r30 v2 dV Ttype=multipolygon,building=yes,name=Shed Mw20@\n",
        append = true)
      assert(db.count(point) == 0)
      assert(db.count(line) == 0)
      assert(db.count(polygon) == 1)
      assert(db.count(polygon, "osm_id = -30 AND tags['building'] = " +
        "'yes' AND st_geometrytype(geom) = 'ST_Polygon'") == 1)
      // SECTION: remove relation / remove multipolygon tag
      db.runImport(change, append = true)
      assert(db.count(point) == 0)
      assert(db.count(line) == 0)
      assert(db.count(polygon) == 0)
    }
  }
}
