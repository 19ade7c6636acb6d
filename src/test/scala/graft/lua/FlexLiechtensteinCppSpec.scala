package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex.cpp: the Liechtenstein regression
  * over the reference's `test_output_flex.lua` — exact table counts
  * from the real extract. (The C++ file also re-runs with -l/latlon;
  * the counts are identical, and our flex projection is a per-column
  * property, so the single run covers the contract.) */
class FlexLiechtensteinCppSpec extends SparkSpecBase {

  test("liechtenstein regression") {
    val db = new FlexCppHarness(spark, "test_output_flex.lua")
    db.runFile("liechtenstein-2013-08-03.osm.pbf")
    assert(db.count("osm2pgsql_test_point") == 1362)
    assert(db.count("osm2pgsql_test_line") == 2932)
    assert(db.count("osm2pgsql_test_polygon") == 4136)
    assert(db.count("osm2pgsql_test_route") == 35)
  }
}
