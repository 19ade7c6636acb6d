package graft

import graft.geom._
import graft.operators.TileCover
import graft.operators.TileCover.{BoundaryOnly, Config, FullArea, Hybrid}

/** Tile-expiry cover semantics (reference test-expire-tiles.cpp
  * intentions re-derived). Coordinates in 3857 meters. */
class TileCoverSpec extends SparkSpecBase {
  import spark.implicits._

  private val EC = graft.functions.TileFunctions.EarthCircumference

  /** center of tile (x,y) at zoom z, in 3857 */
  private def tileCenter(x: Long, y: Long, z: Int): Pt = {
    val w = 1L << z
    Pt(((x + 0.5) / w - 0.5) * EC, (0.5 - (y + 0.5) / w) * EC)
  }

  test("point cover: single tile, buffer grows the box") {
    val p = Point(tileCenter(100, 200, 10), Srid.WebMercator)
    val t = TileCover.cover(p, Config(zoom = 10))
    assert(t == Set((100L, 200L)))
    val buffered = TileCover.cover(p, Config(zoom = 10, buffer = 1.0))
    assert(buffered.size == 9) // 3x3 neighborhood
    assert(buffered.contains((99L, 199L)) && buffered.contains((101L, 201L)))
  }

  test("line cover: contiguous tiles along the walk") {
    val a = tileCenter(10, 10, 10)
    val b = tileCenter(20, 10, 10)
    val l = LineString(Vector(a, b), Srid.WebMercator)
    val t = TileCover.cover(l, Config(zoom = 10, buffer = 0.0))
    assert((10L to 20L).forall(x => t.contains((x, 10L))))
  }

  test("polygon: full-area fills interior, boundary-only leaves hole") {
    // a square spanning tiles 10..20 x 10..20 at z10
    val pts = Seq(tileCenter(10, 10, 10), tileCenter(20, 10, 10),
      tileCenter(20, 20, 10), tileCenter(10, 20, 10), tileCenter(10, 10, 10))
    val poly = FromOsm.createPolygon(pts, Srid.WebMercator)
    val full = TileCover.cover(poly, Config(10, FullArea, buffer = 0.0))
    val boundary = TileCover.cover(poly, Config(10, BoundaryOnly, buffer = 0.0))
    assert(full.contains((15L, 15L))) // interior filled
    assert(!boundary.contains((15L, 15L))) // interior NOT in boundary mode
    assert(boundary.contains((10L, 15L))) // edges in both
    assert(boundary.subsetOf(full))
  }

  test("hybrid mode switches on envelope size") {
    val pts = Seq(tileCenter(10, 10, 10), tileCenter(20, 10, 10),
      tileCenter(20, 20, 10), tileCenter(10, 20, 10), tileCenter(10, 10, 10))
    val poly = FromOsm.createPolygon(pts, Srid.WebMercator)
    val small = TileCover.cover(poly, Config(10, Hybrid(EC), buffer = 0.0))
    assert(small.contains((15L, 15L))) // under limit -> full area
    val big = TileCover.cover(poly, Config(10, Hybrid(1000.0), buffer = 0.0))
    assert(!big.contains((15L, 15L))) // over limit -> boundary only
  }

  test("DataFrame geometryCover dedups across geometries") {
    val g1 = Ewkb.encode(Point(tileCenter(5, 5, 8), Srid.WebMercator))
    val g2 = Ewkb.encode(Point(tileCenter(5, 5, 8), Srid.WebMercator))
    val df = Seq(g1, g2).toDF("geom")
    import org.apache.spark.sql.functions.col
    val tiles = TileCover.geometryCover(df, col("geom"), Config(zoom = 8))
    assert(tiles.count() == 1)
  }

  test("diffCover dirties old AND new tiles; null-safe for ins/del") {
    import org.apache.spark.sql.functions.col
    def pt(x: Long, y: Long) =
      Ewkb.encode(Point(tileCenter(x, y, 8), Srid.WebMercator))
    val rows = Seq(
      (pt(5, 5), pt(9, 9)),                      // modify: moved
      (pt(20, 20), null.asInstanceOf[Array[Byte]]), // delete: old only
      (null.asInstanceOf[Array[Byte]], pt(30, 30))) // insert: new only
      .toDF("old_geom", "new_geom")
    val tiles = TileCover
      .diffCover(rows, col("old_geom"), col("new_geom"), Config(zoom = 8))
      .select($"x", $"y").as[(Long, Long)].collect().toSet
    assert(tiles == Set((5L, 5L), (9L, 9L), (20L, 20L), (30L, 30L)))
  }
}
