package graft

import graft.geom._
import graft.operators.RasterGen
import graft.operators.RasterGen.{Canvas, Config, GenTile, Tracer}

/** Raster-union generalization kernels (reference: gen-tile-raster.cpp
  * / canvas.cpp / tracer.cpp): fill, morphology, crack tracing, and
  * the Spark operator end-to-end (dissolve of overlapping polygons).
  */
class RasterGenSpec extends SparkSpecBase {
  import spark.implicits._

  private val EC = graft.functions.TileFunctions.EarthCircumference
  private val Half = EC / 2.0

  // zoom 0 → single world tile; extent 64 px → pixel = EC/64
  private val tile0 = GenTile(0, 0, 0)
  private val pixel = EC / 64.0

  /** world-coord rect from pixel-grid coords (global pixel space at
    * zoom 0/extent 64, row 0 = top). */
  private def rectPoly(px: Int, py: Int, w: Int, h: Int): Polygon = {
    val x0 = -Half + px * pixel
    val x1 = -Half + (px + w) * pixel
    val yT = Half - py * pixel
    val yB = Half - (py + h) * pixel
    Polygon(Ring(Vector(Pt(x0, yB), Pt(x1, yB), Pt(x1, yT), Pt(x0, yT),
      Pt(x0, yB))), Vector.empty, Srid.WebMercator)
  }

  test("canvas fill paints exactly the pixels whose center is inside") {
    val c = new Canvas(64, 0)
    c.drawPolygon(rectPoly(10, 20, 5, 3), tile0)
    assert(c.paintedPixels == 15)
    assert(c.get(10, 20) && c.get(14, 22))
    assert(!c.get(9, 20) && !c.get(15, 20) && !c.get(10, 23))
  }

  test("tracer recovers a rectangle exactly (area == painted pixels)") {
    val c = new Canvas(64, 0)
    c.drawPolygon(rectPoly(10, 20, 5, 3), tile0)
    val polys = Tracer.trace(c, tile0, turdsize = 0, minArea = 0.0)
    assert(polys.size == 1)
    assert(polys.head.inners.isEmpty)
    // collinear merge leaves the 4 corners
    assert(polys.head.outer.pts.size == 5)
    val area = math.abs(GeomOps.area(polys.head))
    assert(math.abs(area / (pixel * pixel) - 15.0) < 1e-6)
  }

  test("overlapping rectangles dissolve into one polygon") {
    val c = new Canvas(64, 0)
    c.drawPolygon(rectPoly(10, 10, 6, 6), tile0)
    c.drawPolygon(rectPoly(13, 13, 6, 6), tile0)
    val polys = Tracer.trace(c, tile0, 0, 0.0)
    assert(polys.size == 1)
    val px = math.abs(GeomOps.area(polys.head)) / (pixel * pixel)
    assert(math.abs(px - (36 + 36 - 9)) < 1e-6) // union, not sum
  }

  test("donut: hole traced and assigned to its outer") {
    val c = new Canvas(64, 0)
    c.drawPolygon(Polygon(rectPoly(10, 10, 10, 10).outer,
      Vector(rectPoly(13, 13, 4, 4).outer), Srid.WebMercator), tile0)
    assert(c.paintedPixels == 100 - 16)
    val polys = Tracer.trace(c, tile0, 0, 0.0)
    assert(polys.size == 1)
    assert(polys.head.inners.size == 1)
    val net = math.abs(GeomOps.area(polys.head)) / (pixel * pixel)
    assert(math.abs(net - 84.0) < 1e-6)
  }

  test("turdsize drops speckles") {
    val c = new Canvas(64, 0)
    c.drawPolygon(rectPoly(10, 10, 8, 8), tile0)
    c.drawPolygon(rectPoly(40, 40, 1, 1), tile0) // 1-px speckle
    val kept = Tracer.trace(c, tile0, turdsize = 2, minArea = 0.0)
    assert(kept.size == 1)
    val all = Tracer.trace(c, tile0, turdsize = 0, minArea = 0.0)
    assert(all.size == 2)
  }

  test("open/close removes thin connections and closes small gaps") {
    val c = new Canvas(64, 0)
    // two 6x6 blocks joined by a 1px-wide bridge
    c.drawPolygon(rectPoly(4, 10, 6, 6), tile0)
    c.drawPolygon(rectPoly(20, 10, 6, 6), tile0)
    c.drawPolygon(rectPoly(10, 12, 10, 1), tile0)
    c.openClose(2)
    // the bridge is eroded away; blocks survive
    val polys = Tracer.trace(c, tile0, 0, 0.0)
    assert(polys.size == 2)
  }

  test("two nearby blocks merge under a large close radius") {
    val c = new Canvas(256, 0)
    val t = GenTile(0, 0, 0)
    val p = EC / 256.0
    def rp(px: Int, py: Int, w: Int, h: Int) = {
      val x0 = -Half + px * p; val x1 = -Half + (px + w) * p
      val yT = Half - py * p; val yB = Half - (py + h) * p
      Polygon(Ring(Vector(Pt(x0, yB), Pt(x1, yB), Pt(x1, yT), Pt(x0, yT),
        Pt(x0, yB))), Vector.empty, Srid.WebMercator)
    }
    c.drawPolygon(rp(40, 40, 20, 20), t)
    c.drawPolygon(rp(63, 40, 20, 20), t) // 3px gap
    c.openClose(4) // dilate(8) bridges the 3px gap
    val polys = Tracer.trace(c, t, 0, 0.0)
    assert(polys.size == 1)
  }

  test("rasterUnion operator: per-tile dissolve with param grouping") {
    // zoom 1 → 2x2 tiles of 64px: geometries in different tiles and
    // params stay separate; overlaps within a (tile, param) dissolve
    val z1t = EC / 2.0
    def rect(tx: Long, ty: Long, px: Int, py: Int, w: Int, h: Int) = {
      val x0 = -Half + tx * z1t + px * (z1t / 64)
      val x1 = x0 + w * (z1t / 64)
      val yT = Half - ty * z1t - py * (z1t / 64)
      val yB = yT - h * (z1t / 64)
      Ewkb.encode(Polygon(Ring(Vector(Pt(x0, yB), Pt(x1, yB), Pt(x1, yT),
        Pt(x0, yT), Pt(x0, yB))), Vector.empty, Srid.WebMercator))
    }
    val df = Seq(
      ("a", rect(0, 0, 10, 10, 8, 8)),
      ("a", rect(0, 0, 14, 14, 8, 8)), // overlaps → dissolves with the first
      ("b", rect(0, 0, 40, 40, 4, 4)), // same tile, other param
      ("a", rect(1, 1, 5, 5, 4, 4))    // other tile
    ).toDF("param", "geom")
    val out = RasterGen.rasterUnion(df, "geom", Some("param"),
      Config(zoom = 1, imageExtent = 64, margin = 0.0, bufferSize = 0,
        turdsize = 0)).collect()
    assert(out.length == 3)
    val byKey = out.map(r => ((r.getAs[Long]("x"), r.getAs[Long]("y"),
      r.getAs[String]("param")), r.getAs[Long]("painted_px"))).toMap
    assert(byKey((0L, 0L, "a")) == 64 + 64 - 16)
    assert(byKey((0L, 0L, "b")) == 16)
    assert(byKey((1L, 1L, "a")) == 16)
  }

  test("builtup: merged multi-source canvases trace once") {
    val z0 = EC
    def rect(px: Int, py: Int, w: Int, h: Int) =
      Ewkb.encode(rectPoly(px, py, w, h))
    val df = Seq(
      ("t1", rect(10, 10, 6, 6)),
      ("t2", rect(13, 13, 6, 6))
    ).toDF("src", "geom")
    val out = RasterGen.builtup(df, "geom", "src",
      Map("t1" -> 0, "t2" -> 0),
      Config(zoom = 0, imageExtent = 64, margin = 0.0, bufferSize = 0,
        turdsize = 0)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("painted_px") == 36 + 36 - 9)
  }

  test("tracer area == painted pixels on random overlapping rects") {
    // net traced area (outers minus holes) must equal the painted
    // pixel count exactly, whatever components/holes the overlap forms
    val rng = new scala.util.Random(11)
    val t = GenTile(0, 0, 0)
    val p256 = EC / 256.0
    (0 until 25).foreach { trial =>
      val c = new Canvas(256, 0)
      (0 until 2 + rng.nextInt(10)).foreach { _ =>
        val x0 = rng.nextInt(200); val y0 = rng.nextInt(200)
        val w = 1 + rng.nextInt(40); val h = 1 + rng.nextInt(40)
        val xw0 = -Half + x0 * p256; val xw1 = -Half + (x0 + w) * p256
        val yT = Half - y0 * p256; val yB = Half - (y0 + h) * p256
        c.drawPolygon(Polygon(Ring(Vector(Pt(xw0, yB), Pt(xw1, yB),
          Pt(xw1, yT), Pt(xw0, yT), Pt(xw0, yB))), Vector.empty,
          Srid.WebMercator), t)
      }
      val polys = Tracer.trace(c, t, turdsize = 0, minArea = 0.0)
      val traced = polys.map(p => math.abs(GeomOps.area(p))).sum
      assert(math.abs(traced / (p256 * p256) - c.paintedPixels) < 1e-6,
        s"trial $trial: traced=${traced / (p256 * p256)} " +
          s"painted=${c.paintedPixels}")
    }
  }

  test("WKB raster export matches the PostGIS v0 layout byte-for-byte") {
    val c = new Canvas(64, 0)
    c.drawPolygon(rectPoly(0, 0, 1, 1), tile0)
    val wkb = c.toWkbRaster(tile0, 0.0)
    assert(wkb.length == 61 + 2 + 64 * 64)
    val bb = java.nio.ByteBuffer.wrap(wkb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.get() == 1)           // little-endian flag
    assert(bb.getShort() == 0)      // version
    assert(bb.getShort() == 1)      // nBands
    assert(bb.getDouble() == tile0.extent / 64) // scaleX
    assert(bb.getDouble() == -(tile0.extent / 64))
    assert(bb.getDouble() == tile0.xmin)        // ipX (margin 0)
    assert(bb.getDouble() == tile0.ymax)        // ipY
    bb.getDouble(); bb.getDouble()  // skews
    assert(bb.getInt() == 3857)
    assert(bb.getShort() == 64 && bb.getShort() == 64)
    assert(bb.get() == 4)           // 8BUI pixel type
    assert(bb.get() == 0)           // nodata
    val px = new Array[Byte](64 * 64)
    bb.get(px)
    assert(px(0) == 0xff.toByte)    // pixel (0,0) painted
    assert(px.count(_ != 0) == 1)
  }

  test("expire table lifecycle SQL mirrors the reference") {
    import graft.operators.Expire
    assert(Expire.tableDdl("exp").contains("PRIMARY KEY (zoom, x, y)"))
    assert(Expire.tableUpsertSql("exp", legacyThreeColumn = true)
      .endsWith("ON CONFLICT DO NOTHING"))
    assert(Expire.tableUpsertSql("exp", legacyThreeColumn = false)
      .contains("DO UPDATE SET last = CURRENT_TIMESTAMP(0)"))
  }

  test("vectorUnion strategy: buffer sandwich dissolves per tile") {
    // zoom 0, one world tile; two squares 3 units apart with b=2:
    // +2 buffers overlap -> union fuses -> -4/+2 restores scale
    def sq(x0: Double, y0: Double, s: Double) = Ewkb.encode(
      Polygon(Ring(Vector(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s),
        Pt(x0, y0 + s), Pt(x0, y0))), Vector.empty, Srid.WebMercator))
    val df = Seq(
      ("a", sq(0, 0, 10)), ("a", sq(13, 0, 10)),   // gap 3 < 2b: merge
      ("a", sq(1000, 1000, 10)),                   // far: stays separate
      ("b", sq(0, 0, 10))                          // other group
    ).toDF("param", "geom")
    val out = graft.operators.Gen.vectorUnion(df, "geom", Some("param"),
      zoom = 0, margin = 0.0, bufferSize = 2.0).collect()
    val byParam = out.groupBy(_.getAs[String]("param"))
    assert(byParam("a").length == 2) // merged pair + far square
    assert(byParam("b").length == 1)
    val areas = byParam("a").map(_.getAs[Double]("area")).sorted
    // far square ≈ restored (chordal 16-gon arcs clip ~1 per corner
    // through the ±buffer sandwich)
    assert(math.abs(areas(0) - 100.0) < 5.0)
    assert(areas(1) > 190.0)                  // fused pair + neck
  }

  test("margin buffer paints cross-tile geometry into the canvas apron") {
    // margin 0.5 at extent 64 → buffer rounds up to 64 px
    val cfg = Config(zoom = 1, imageExtent = 64, margin = 0.5,
      bufferSize = 0, turdsize = 0)
    assert(cfg.imageBuffer == 64)
    // rect fully inside tile (1,1) but within margin of tile (0,0)
    val z1t = EC / 2.0
    val x0 = -Half + z1t + 2 * (z1t / 64)
    val poly = Polygon(Ring(Vector(
      Pt(x0, Half - z1t - 6 * (z1t / 64)), Pt(x0 + 4 * (z1t / 64), Half - z1t - 6 * (z1t / 64)),
      Pt(x0 + 4 * (z1t / 64), Half - z1t - 2 * (z1t / 64)), Pt(x0, Half - z1t - 2 * (z1t / 64)),
      Pt(x0, Half - z1t - 6 * (z1t / 64)))), Vector.empty, Srid.WebMercator)
    val df = Seq(("", Ewkb.encode(poly))).toDF("param", "geom")
    val out = RasterGen.rasterUnion(df, "geom", None, cfg).collect()
    // binned to all 4 tiles via margin; traced polygons only where painted
    val tiles = out.map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
    assert(tiles.contains((1L, 1L)))
    assert(tiles.contains((0L, 0L))) // in the apron of (0,0)'s canvas
  }
}
