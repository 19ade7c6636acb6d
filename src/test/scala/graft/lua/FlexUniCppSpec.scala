package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-uni.cpp over the reference's
  * `test_output_flex_uni.lua`: universal ('any' ids) tables — one
  * with the single mapped id column (node=id, way=-id,
  * relation=-id-1e17; flex-table.cpp map_id) and one with separate
  * type/id columns — through the full update flow. */
class FlexUniCppSpec extends SparkSpecBase {

  private val conf = "test_output_flex_uni.lua"
  private val d1 = "osm2pgsql_test_data1"
  private val d2 = "osm2pgsql_test_data2"

  test("updating a node (uni tables)") {
    Seq("n10 v3 dV x10 y10\n", "n10 v3 dD\n").foreach { change =>
      val db = new FlexCppHarness(spark, conf)
      db.runImport("n10 v1 dV x10 y10\n", append = false)
      assert(db.count(d2, "x_type = 'N'") == 0)
      assert(db.count(d1, "the_id > 0") == 0)
      db.runImport("n10 v2 dV x10 y10 Tamenity=restaurant\n",
        append = true)
      assert(db.count(d2, "x_type = 'N'") == 1)
      assert(db.count(d1, "the_id > 0") == 1)
      assert(db.count(d2, "x_type = 'N' AND x_id = 10 AND " +
        "tags['amenity'] = 'restaurant'") == 1)
      assert(db.count(d1, "the_id = 10 AND " +
        "tags['amenity'] = 'restaurant'") == 1)
      db.runImport(change, append = true)
      assert(db.count(d2, "x_type = 'N'") == 0)
      assert(db.count(d1, "the_id > 0") == 0)
    }
  }

  test("updating a way (uni tables)") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "n10 v1 dV x10.0 y10.1\n" +
      "n11 v1 dV x10.1 y10.2\n" +
      "w20 v1 dV Thighway=primary Nn10,n11\n", append = false)
    def checkWay(tag: String, nPoints: Int): Unit = {
      assert(db.count(d2, "x_type = 'N'") == 0)
      assert(db.count(d1, "the_id > 0") == 0)
      assert(db.count(d2, "x_type = 'W'") == 1)
      assert(db.count(d1, "the_id < 0 AND the_id > -1e17") == 1)
      assert(db.count(d2, s"x_type = 'W' AND x_id = 20 AND " +
        s"tags['highway'] = '$tag' AND st_numpoints(geom) = $nPoints")
        == 1)
      assert(db.count(d1, s"the_id = -20 AND tags['highway'] = '$tag' " +
        s"AND st_numpoints(geom) = $nPoints") == 1)
    }
    checkWay("primary", 2)
    db.runImport("w20 v2 dV Thighway=secondary Nn10,n11\n", append = true)
    checkWay("secondary", 2)
    db.runImport("n10 v2 dV x10.0 y10.3\n", append = true)
    checkWay("secondary", 2)
    db.runImport("n12 v1 dV x10.2 y10.1\n" +
      "w20 v3 dV Thighway=residential Nn10,n11,n12\n", append = true)
    checkWay("residential", 3)
    db.runImport("w20 v4 dD\n", append = true)
    assert(db.count(d2) == 0)
    assert(db.count(d1) == 0)
  }

  test("ways as linestrings and polygons (uni tables)") {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(
      "n10 v1 dV x10.0 y10.0\n" +
      "n11 v1 dV x10.0 y10.2\n" +
      "n12 v1 dV x10.2 y10.2\n" +
      "n13 v1 dV x10.2 y10.0\n" +
      "w20 v1 dV Tbuilding=yes Nn10,n11,n12,n13,n10\n", append = false)
    def poly(n: Int): Unit = {
      assert(db.count(d2, "x_type = 'W' AND x_id = 20 AND " +
        "tags['building'] = 'yes' AND " +
        "st_geometrytype(geom) = 'ST_Polygon'") == n)
      assert(db.count(d1, "the_id = -20 AND tags['building'] = 'yes' " +
        "AND st_geometrytype(geom) = 'ST_Polygon'") == n)
    }
    def lineStr(n: Int): Unit = {
      assert(db.count(d2, "x_type = 'W' AND x_id = 20 AND " +
        "tags['highway'] = 'secondary' AND " +
        "st_geometrytype(geom) = 'ST_LineString'") == n)
      assert(db.count(d1, "the_id = -20 AND tags['highway'] = " +
        "'secondary' AND st_geometrytype(geom) = 'ST_LineString'") == n)
    }
    poly(1); lineStr(0)
    db.runImport("w20 v2 dV Thighway=secondary Nn10,n11,n12,n13,n10\n",
      append = true)
    poly(0); lineStr(1)
    db.runImport("w20 v3 dV Thighway=secondary Nn10,n11,n12,n13\n",
      append = true)
    poly(0); lineStr(1)
    // area tag on an UNCLOSED way: drops from both tables
    db.runImport("w20 v4 dV Tbuilding=yes Nn10,n11,n12,n13\n",
      append = true)
    assert(db.count(d2) == 0)
    assert(db.count(d1) == 0)
    db.runImport("w20 v5 dV Tbuilding=yes Nn10,n11,n12,n13,n10\n",
      append = true)
    poly(1)
  }

  test("multipolygons (uni tables)") {
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
      def checkRel(): Unit = {
        assert(db.count(d2, "x_type = 'N'") == 0)
        assert(db.count(d1, "the_id > 0") == 0)
        assert(db.count(d2, "x_type = 'W'") == 0)
        assert(db.count(d1, "the_id < 0 AND the_id > -1e17") == 0)
        assert(db.count(d2, "x_type = 'R'") == 1)
        assert(db.count(d1, "the_id < -1e17") == 1)
        assert(db.count(d2, "x_type = 'R' AND x_id = 30 AND " +
          "tags['building'] = 'yes' AND " +
          "st_geometrytype(geom) = 'ST_Polygon'") == 1)
        assert(db.count(d1, "the_id = (-30 - 1e17) AND " +
          "tags['building'] = 'yes' AND " +
          "st_geometrytype(geom) = 'ST_Polygon'") == 1)
      }
      checkRel()
      db.runImport(
        "r30 v2 dV Ttype=multipolygon,building=yes,name=Shed Mw20@\n",
        append = true)
      checkRel()
      db.runImport(change, append = true)
      assert(db.count(d2) == 0)
      assert(db.count(d1) == 0)
    }
  }
}
