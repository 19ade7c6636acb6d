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

    // geometry-sum goldens from the same feature:
    //   sum(ST_Area(way))::int = 1247245186, sum(way_area)::int =
    //   1247243136 (real-typed column), sum(ST_Length) line = 4211350,
    //   roads = 2032023
    import org.apache.spark.sql.functions._
    import graft.expressions.GeomExpressions.{stAreaN, stLengthN}
    import spark.implicits._
    val sumArea = t.polygon.agg(sum(stAreaN($"geom"))).as[Double].head()
    assert(math.abs(sumArea - 1247245186.0) / 1247245186.0 < 1e-4,
      s"sum(ST_Area)=$sumArea")
    // way_area golden reflects PG's float4-accumulating SUM (order-
    // dependent low bits) — reproducible only to ~2e-6 relative
    val sumWayArea = t.polygon.agg(sum($"way_area".cast("double")))
      .as[Double].head()
    assert(math.abs(sumWayArea - 1247243136.0) / 1247243136.0 < 1e-4,
      s"sum(way_area)=$sumWayArea")
    val sumLine = t.line.agg(sum(stLengthN($"geom"))).as[Double].head()
    assert(math.abs(sumLine - 4211350.0) / 4211350.0 < 1e-4,
      s"sum(line length)=$sumLine")
    val sumRoads = t.roads.agg(sum(stLengthN($"geom"))).as[Double].head()
    assert(math.abs(sumRoads - 2032023.0) / 2032023.0 < 1e-4,
      s"sum(roads length)=$sumRoads")
  }
}
