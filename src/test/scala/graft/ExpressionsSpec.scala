package graft

import org.apache.spark.sql.functions._

import graft.expressions.GeomExpressions
import graft.functions.TileFunctions
import graft.geom._

class ExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("TileQuadkey codegen matches the Column-expression quadkey") {
    val df = Seq((3L, 5L), (123L, 456L), (0L, 0L), (16383L, 16383L))
      .toDF("x", "y")
    val both = df.select(
      GeomExpressions.quadkey($"x", $"y", lit(14)).as("native"),
      TileFunctions.quadkey($"x", $"y", 14).as("composed"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, c) => assert(n == c) }
    // interleave sanity: x=1,y=0 -> 1; x=0,y=1 -> 2; x=1,y=1 -> 3
    val q = Seq((1L, 1L)).toDF("x", "y")
      .select(GeomExpressions.quadkey($"x", $"y", lit(1)))
      .as[Long].head()
    assert(q == 3L)
  }

  test("native geometry expressions eval over EWKB, null-safe") {
    val sq = Ewkb.encode(FromOsm.createPolygon(
      Seq(Pt(0, 0), Pt(2, 0), Pt(2, 2), Pt(0, 2), Pt(0, 0))))
    val line = Ewkb.encode(LineString(Vector(Pt(0, 0), Pt(3, 4))))
    val df = Seq(Some(sq), Some(line), None).toDF("g")
    val out = df.select(
      GeomExpressions.stAreaN($"g").as("a"),
      GeomExpressions.stLengthN($"g").as("l"),
      GeomExpressions.stGeometryTypeN($"g").as("t"))
      .as[(Option[Double], Option[Double], Option[String])].collect()
    assert(out(0) == ((Some(4.0), Some(0.0), Some("POLYGON"))))
    assert(out(1) == ((Some(0.0), Some(5.0), Some("LINESTRING"))))
    assert(out(2) == ((None, None, None)))
  }

  test("register() exposes the functions to SQL") {
    GeomExpressions.register(spark)
    val q = spark.sql("SELECT tile_quadkey(1L, 1L, 1)").as[Long].head()
    assert(q == 3L)
    Seq(Ewkb.encode(Point(Pt(1, 2)))).toDF("g").createOrReplaceTempView("gt")
    assert(spark.sql("SELECT st_geometry_type_n(g) FROM gt")
      .as[String].head() == "POINT")
  }
}
