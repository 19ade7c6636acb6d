package graft

import graft.classic.{ClassicPipeline, StyleFile}
import graft.sources.OsmPbf

/** The reference's own regression: importing the Liechtenstein extract
  * with the default style must produce the golden table counts from
  * tests/bdd/regression/import.feature:
  *   point=1342, polygon=4130, line=3231, roads=375 (3857).
  * All four counts are asserted EXACTLY.
  */
class ClassicRegressionSpec extends SparkSpecBase {

  private val path = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"

  test("liechtenstein regression counts vs reference goldens") {
    val osm = OsmPbf.read(spark, path)
    val t = ClassicPipeline.run(osm, StyleFile.defaultStyle)
    val nPoint = t.point.count()
    val nPoly = t.polygon.count()
    val nLine = t.line.count()
    val nRoads = t.roads.count()
    info(s"point=$nPoint polygon=$nPoly line=$nLine roads=$nRoads")
    assert(nPoint == 1342L)
    assert(nPoly == 4130L)
    assert(nLine == 3231L)
    assert(nRoads == 375L)
  }
}
