package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.geom._

/** Raster-union generalization — the reference's `raster-union` and
  * `builtup` strategies (src/gen/gen-tile-raster.cpp:174-250,
  * src/gen/gen-tile-builtup.cpp:179-266): per tile, paint polygons
  * onto a bitmap canvas (union-by-painting), morphologically
  * open/close to generalize (canvas.cpp:20-32), then trace the bitmap
  * back to vector polygons (tracer.cpp:41-130).
  *
  * The reference delegates painting to OpenCV and tracing to potrace;
  * here both are small pure-JVM kernels with the same contract:
  *  - fill: even-odd rule over all rings, a pixel is painted iff its
  *    CENTER is inside (documented rule — OpenCV's fillPoly boundary
  *    pixels may differ by ±1 px);
  *  - open/close: erode(b) → dilate(2b) → erode(b) with rectangular
  *    kernels, anchor at k/2, border = foreground for erosion and
  *    background for dilation (OpenCV defaults);
  *  - trace: crack-following along pixel boundaries with fg on the
  *    left, speckles of area ≤ turdsize dropped (potrace's turdsize),
  *    collinear lattice vertices merged. Unlike potrace's "optimal
  *    polygon" stage the traced rings are the EXACT pixel boundary —
  *    enclosed area equals the painted pixel count, which is what
  *    makes the operator oracle-checkable.
  *
  * Spark shape: geometries are binned to every tile whose
  * margin-expanded box intersects their envelope (the `&&` bbox join
  * in the reference's prepared SQL), then one `flatMapGroups` per
  * (tile, group-param) paints and traces locally — canvases never
  * cross the wire, the only shuffle is the tile binning, and tiles
  * are embarrassingly parallel exactly like the reference's tile
  * worker pool (osm2pgsql-gen.cpp).
  */
object RasterGen {

  import graft.functions.TileFunctions.EarthCircumference
  private val HalfEarth = EarthCircumference / 2.0

  /** Tile addressing in 3857 (src/tile.hpp:118-210). */
  final case class GenTile(zoom: Int, x: Long, y: Long) {
    def extent: Double = EarthCircumference / (1L << zoom)
    def xmin: Double = -HalfEarth + x * extent
    def ymin: Double = HalfEarth - (y + 1) * extent
    def xmax: Double = xmin + extent
    def ymax: Double = ymin + extent
    /** margin-expanded, clamped to the world (src/tile.hpp:148-175) */
    def xminM(margin: Double): Double =
      math.max(-HalfEarth, math.min(HalfEarth, xmin - margin * extent))
    def ymaxM(margin: Double): Double =
      math.max(-HalfEarth, math.min(HalfEarth, ymax + margin * extent))
    def toTileCoords(p: Pt, pixelExtent: Int): Pt = {
      val f = pixelExtent / extent
      Pt((p.x - xmin) * f, (p.y - ymin) * f)
    }
    def toWorldCoords(p: Pt, pixelExtent: Int): Pt = {
      val f = extent / pixelExtent
      Pt(p.x * f + xmin, p.y * f + ymin)
    }
  }

  /** Strategy parameters (gen-tile-raster.cpp:86-96 defaults).
    * `imageBuffer` is derived from the margin exactly like the
    * reference (round_up(margin·extent, 64), gen-tile-raster.cpp:
    * 132-137). */
  final case class Config(zoom: Int, imageExtent: Int = 2048,
      margin: Double = 0.0, bufferSize: Int = 10, turdsize: Int = 2,
      minArea: Double = 0.0) {
    require((imageExtent & (imageExtent - 1)) == 0,
      "image_extent must be a power of 2")
    val imageBuffer: Int =
      (((margin * imageExtent).toLong + 63L) / 64L * 64L).toInt
    val effectiveMargin: Double = imageBuffer.toDouble / imageExtent
  }

  // ------------------------------------------------------------------
  // canvas (reference: src/gen/canvas.hpp/cpp over OpenCV)
  // ------------------------------------------------------------------

  final class Canvas(val extent: Int, val buffer: Int) {
    val size: Int = extent + 2 * buffer
    val data = new Array[Byte](size * size)

    @inline private def idx(x: Int, y: Int): Int = y * size + x
    @inline def get(x: Int, y: Int): Boolean =
      x >= 0 && x < size && y >= 0 && y < size && data(idx(x, y)) != 0
    @inline private def set(x: Int, y: Int): Unit =
      if (x >= 0 && x < size && y >= 0 && y < size) data(idx(x, y)) = 1

    /** 3857 → image coords: x right, y DOWN, buffer offset
      * (canvas.cpp:40-46). */
    private def toImage(p: Pt, tile: GenTile): Pt = {
      val tp = tile.toTileCoords(p, extent)
      Pt(buffer + tp.x, (buffer + extent) - tp.y)
    }

    private def segments(rings: Seq[Vector[Pt]]): Seq[(Pt, Pt)] =
      rings.flatMap { r =>
        val closed = if (r.nonEmpty && r.head != r.last) r :+ r.head else r
        closed.iterator.zip(closed.iterator.drop(1)).toSeq
      }

    /** Even-odd scanline fill at pixel centers over all rings of the
      * polygon (outer + holes together, like cv::fillPoly). */
    def drawPolygon(poly: Polygon, tile: GenTile): Unit = {
      val rings = (poly.outer +: poly.inners)
        .map(r => r.pts.map(toImage(_, tile)))
      val segs = segments(rings)
      if (segs.isEmpty) return
      var yMin = Double.MaxValue; var yMax = Double.MinValue
      segs.foreach { case (a, b) =>
        yMin = math.min(yMin, math.min(a.y, b.y))
        yMax = math.max(yMax, math.max(a.y, b.y))
      }
      var iy = math.max(0, math.floor(yMin - 0.5).toInt)
      val iyEnd = math.min(size - 1, math.ceil(yMax).toInt)
      val xs = mutable.ArrayBuffer.empty[Double]
      while (iy <= iyEnd) {
        val yc = iy + 0.5
        xs.clear()
        segs.foreach { case (a, b) =>
          if ((a.y <= yc && b.y > yc) || (b.y <= yc && a.y > yc))
            xs += a.x + (yc - a.y) / (b.y - a.y) * (b.x - a.x)
        }
        val sorted = xs.sorted
        var i = 0
        while (i + 1 < sorted.size) {
          var x = math.ceil(sorted(i) - 0.5).toInt
          val xe = math.floor(sorted(i + 1) - 0.5).toInt
          while (x <= xe) { set(x, iy); x += 1 }
          i += 2
        }
        iy += 1
      }
    }

    /** 1-px polyline (cv::polylines on truncated int coords). */
    def drawLineString(ls: LineString, tile: GenTile): Unit = {
      val pts = ls.pts.map { p =>
        val ip = toImage(p, tile); (ip.x.toInt, ip.y.toInt)
      }
      pts.iterator.zip(pts.iterator.drop(1)).foreach {
        case ((x0, y0), (x1, y1)) => bresenham(x0, y0, x1, y1)
      }
    }

    private def bresenham(x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
      var x = x0; var y = y0
      val dx = math.abs(x1 - x0); val dy = -math.abs(y1 - y0)
      val sx = if (x0 < x1) 1 else -1
      val sy = if (y0 < y1) 1 else -1
      var err = dx + dy
      while ({
        set(x, y)
        x != x1 || y != y1
      }) {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }

    def draw(g: Geometry, tile: GenTile): Unit = g match {
      case l: LineString       => drawLineString(l, tile)
      case p: Polygon          => drawPolygon(p, tile)
      case MultiPolygon(ps, _) => ps.foreach(drawPolygon(_, tile))
      case MultiLineString(ls, _) => ls.foreach(drawLineString(_, tile))
      case GeometryCollection(gs, _) => gs.foreach(draw(_, tile))
      case _                   => () // points etc: not drawn (canvas.cpp:78-102)
    }

    /** erode(b) → dilate(2b) → erode(b), rect kernels
      * (canvas.cpp:20-32). */
    def openClose(b: Int): Unit =
      if (b > 0) { erode(b); dilate(2 * b); erode(b) }

    // integral image of fg counts; ii(x, y) = count in [0,x) × [0,y)
    private def integral(): Array[Int] = {
      val w = size + 1
      val ii = new Array[Int]((size + 1) * (size + 1))
      var y = 0
      while (y < size) {
        var rowSum = 0
        var x = 0
        while (x < size) {
          rowSum += (if (data(idx(x, y)) != 0) 1 else 0)
          ii((y + 1) * w + (x + 1)) = ii(y * w + (x + 1)) + rowSum
          x += 1
        }
        y += 1
      }
      ii
    }

    private def windowCount(ii: Array[Int], x0: Int, y0: Int, x1: Int,
        y1: Int): (Int, Int) = {
      // clip to canvas; returns (fg count, cells in bounds)
      val cx0 = math.max(0, x0); val cy0 = math.max(0, y0)
      val cx1 = math.min(size, x1); val cy1 = math.min(size, y1)
      if (cx0 >= cx1 || cy0 >= cy1) (0, 0)
      else {
        val w = size + 1
        val c = ii(cy1 * w + cx1) - ii(cy0 * w + cx1) -
          ii(cy1 * w + cx0) + ii(cy0 * w + cx0)
        (c, (cx1 - cx0) * (cy1 - cy0))
      }
    }

    /** min filter: fg iff whole window fg; outside counts as fg
      * (OpenCV erosion border). */
    private def erode(k: Int): Unit = {
      val ii = integral()
      val a = k / 2
      val out = new Array[Byte](size * size)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val (c, cells) = windowCount(ii, x - a, y - a, x - a + k, y - a + k)
          if (cells > 0 && c == cells) out(idx(x, y)) = 1
          x += 1
        }
        y += 1
      }
      System.arraycopy(out, 0, data, 0, data.length)
    }

    /** max filter: fg iff any window cell fg; outside is bg. */
    private def dilate(k: Int): Unit = {
      val ii = integral()
      val a = k / 2
      val out = new Array[Byte](size * size)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val (c, _) = windowCount(ii, x - a, y - a, x - a + k, y - a + k)
          if (c > 0) out(idx(x, y)) = 1
          x += 1
        }
        y += 1
      }
      System.arraycopy(out, 0, data, 0, data.length)
    }

    /** PostGIS WKB raster (v0, RFC2) of this canvas — the reference's
      * debugging img_table payload (canvas.cpp to_wkb + raster.cpp
      * header layout, byte-for-byte): little-endian header, one 8BUI
      * band (pixel-type code 4), set pixels as 255. */
    def toWkbRaster(tile: GenTile, margin: Double): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(61 + 2 + size * size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val scaleX = tile.extent / extent
      bb.put(1.toByte)             // endianness: little
      bb.putShort(0)               // version
      bb.putShort(1)               // nBands
      bb.putDouble(scaleX)
      bb.putDouble(-scaleX)
      bb.putDouble(tile.xminM(margin)) // ipX
      bb.putDouble(tile.ymaxM(margin)) // ipY
      bb.putDouble(0.0)            // skewX
      bb.putDouble(0.0)            // skewY
      bb.putInt(Srid.WebMercator)
      bb.putShort(size.toShort)    // width
      bb.putShort(size.toShort)    // height
      bb.put(4.toByte)             // band: bits code 4 = 8BUI
      bb.put(0.toByte)             // band: nodata
      var i = 0
      while (i < data.length) {
        bb.put(if (data(i) != 0) 0xff.toByte else 0.toByte)
        i += 1
      }
      bb.array()
    }

    /** bitwise OR (canvas.cpp merge, used by builtup). */
    def merge(other: Canvas): Unit = {
      require(other.size == size, "canvas size mismatch")
      var i = 0
      while (i < data.length) {
        if (other.data(i) != 0) data(i) = 1
        i += 1
      }
    }

    def paintedPixels: Long = {
      var n = 0L; var i = 0
      while (i < data.length) { if (data(i) != 0) n += 1; i += 1 }
      n
    }
  }

  // ------------------------------------------------------------------
  // tracer (reference: src/gen/tracer.cpp over potrace)
  // ------------------------------------------------------------------

  object Tracer {

    // directions: 0=E 1=S 2=W 3=N in image coords (y down)
    private val DX = Array(1, 0, -1, 0)
    private val DY = Array(0, 1, 0, -1)

    /** Trace all fg boundaries; returns polygons in WORLD (3857)
      * coords. Speckle paths with enclosed pixel area ≤ turdsize are
      * dropped (potrace turdsize); rings with world area < minArea are
      * dropped (tracer.cpp:112-115). */
    def trace(canvas: Canvas, tile: GenTile, turdsize: Int,
        minArea: Double): Vector[Polygon] = {
      val size = canvas.size
      // visited directed vertical "cracks": vertex (x,y) heading S or N
      val visited = new java.util.HashSet[Long]()
      def key(x: Int, y: Int, dir: Int): Long =
        (x.toLong * (size + 1) + y) * 4 + dir

      @inline def fg(x: Int, y: Int): Boolean = canvas.get(x, y)

      // outer rings have negative shoelace in image coords (fg-left
      // tracing, y down); holes positive
      val outers = mutable.ArrayBuffer.empty[(Vector[Pt], Double)]
      // (probe point inside the bg pocket, merged ring)
      val holes = mutable.ArrayBuffer.empty[(Pt, Vector[Pt])]

      var sy = 0
      while (sy < size) {
        var sx = 0
        while (sx < size) {
          // start: downward crack at (sx, sy) with fg east, bg west
          if (fg(sx, sy) && !fg(sx - 1, sy) &&
            !visited.contains(key(sx, sy, 1))) {
            val ring = followLoop(sx, sy, size, visited, key, fg)
            val a2 = shoelace2(ring)
            if (math.abs(a2 / 2.0) > turdsize) {
              val merged = mergeCollinear(ring)
              if (a2 < 0) outers += ((merged, a2))
              else {
                // start crack heads S with bg west: a point just west
                // of its midpoint is inside the pocket
                holes += ((Pt(sx - 0.25, sy + 0.5), merged))
              }
            }
          }
          sx += 1
        }
        sy += 1
      }

      // world conversion: image lattice → tile coords (y flip,
      // tracer.cpp make_point) → 3857
      def toWorld(ring: Vector[Pt]): Ring = Ring(ring.map { p =>
        tile.toWorldCoords(
          Pt(p.x - canvas.buffer, (canvas.buffer + canvas.extent) - p.y),
          canvas.extent)
      })

      val polys = outers.map { case (ring, _) =>
        (ring, mutable.ArrayBuffer.empty[Vector[Pt]])
      }
      holes.foreach { case (probe, h) =>
        // assign each hole to the smallest outer containing its probe
        val candidates = polys.zipWithIndex.filter { case ((o, _), _) =>
          pointInRing(probe, o)
        }
        if (candidates.nonEmpty) {
          val (_, i) = candidates.minBy { case ((o, _), _) =>
            math.abs(shoelace2(o))
          }
          polys(i)._2 += h
        }
      }

      polys.iterator.map { case (outer, hs) =>
        val worldOuter = toWorld(outer)
        (Polygon(worldOuter, hs.map(toWorld).toVector, Srid.WebMercator),
          math.abs(ringArea(worldOuter)))
      }.collect {
        case (p, a) if a >= minArea =>
          p.copy(inners = p.inners.filter(r => math.abs(ringArea(r)) >= minArea))
      }.toVector
    }

    /** follow the boundary loop with fg on the LEFT of travel; ties at
      * saddle configurations turn left (fixed policy; potrace's default
      * is "minority" — documented deviation). Terminates on returning
      * to the directed START EDGE (not the start vertex — a saddle
      * vertex is legitimately visited twice by one loop). */
    private def followLoop(sx: Int, sy: Int, size: Int,
        visited: java.util.HashSet[Long], key: (Int, Int, Int) => Long,
        fg: (Int, Int) => Boolean): Vector[Pt] = {
      val ring = Vector.newBuilder[Pt]
      var x = sx; var y = sy
      var dir = 1 // heading S: fg pixel (x,y) on the east/left
      val cap = (size + 1).toLong * (size + 1) * 4
      var steps = 0L
      while ({
        ring += Pt(x, y)
        if (dir == 1) visited.add(key(x, y, 1))
        else if (dir == 3) visited.add(key(x, y - 1, 3))
        x += DX(dir); y += DY(dir)
        // 2x2 pixels around the arrival vertex, ahead-left/right of dir
        val (flx, fly, frx, fry) = dir match {
          case 0 => (x, y - 1, x, y)         // E: left N pixel, right S
          case 1 => (x, y, x - 1, y)         // S: left E, right W
          case 2 => (x - 1, y, x - 1, y - 1) // W: left S, right N
          case _ => (x - 1, y - 1, x, y - 1) // N: left W, right E
        }
        val fl = fg(flx, fly); val fr = fg(frx, fry)
        dir =
          if (!fl) (dir + 3) % 4      // turn left
          else if (!fr) dir           // straight
          else (dir + 1) % 4          // turn right
        steps += 1
        if (steps > cap)
          throw new IllegalStateException("tracer failed to close loop")
        !(x == sx && y == sy && dir == 1)
      }) ()
      val r = ring.result()
      r :+ r.head
    }

    private def shoelace2(ring: Vector[Pt]): Double = {
      var s = 0.0
      var i = 1
      while (i < ring.size) {
        s += ring(i - 1).x * ring(i).y - ring(i).x * ring(i - 1).y
        i += 1
      }
      s
    }

    private def ringArea(r: Ring): Double = shoelace2(r.pts) / 2.0

    private def mergeCollinear(ring: Vector[Pt]): Vector[Pt] = {
      if (ring.size < 4) return ring
      val open = ring.dropRight(1)
      val n = open.size
      val keep = Vector.newBuilder[Pt]
      var i = 0
      while (i < n) {
        val prev = open((i + n - 1) % n)
        val cur = open(i)
        val next = open((i + 1) % n)
        val collinear = (cur.x - prev.x) * (next.y - cur.y) ==
          (cur.y - prev.y) * (next.x - cur.x)
        if (!collinear) keep += cur
        i += 1
      }
      val r = keep.result()
      if (r.isEmpty) ring else r :+ r.head
    }

    private def pointInRing(p: Pt, ring: Vector[Pt]): Boolean = {
      var inside = false
      var i = 1
      while (i < ring.size) {
        val a = ring(i - 1); val b = ring(i)
        if ((a.y <= p.y && b.y > p.y) || (b.y <= p.y && a.y > p.y)) {
          val xi = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
          if (xi > p.x) inside = !inside
        }
        i += 1
      }
      inside
    }
  }

  // ------------------------------------------------------------------
  // Spark operator surface
  // ------------------------------------------------------------------

  // public: the Encoder-generated deserializer instantiates these
  case class Binned(x: Long, y: Long, param: String, ewkb: Array[Byte])
  case class TraceRow(x: Long, y: Long, param: String,
      geom: Array[Byte], area: Double, painted_px: Long)

  /** tiles whose margin-expanded box intersects the envelope (the
    * reference's `&&` bbox predicate, gen-tile-raster.cpp:146-149). */
  def tilesForBox(box: Box, zoom: Int, margin: Double): Seq[(Long, Long)] = {
    val n = 1L << zoom
    val ext = EarthCircumference / n
    def clamp(v: Long): Long = math.max(0L, math.min(n - 1, v))
    // tile t covers [xmin + t*ext - margin*ext, ...]: intersects iff
    // box ∩ expanded tile box non-empty
    val x0 = clamp(math.floor((box.minX + HalfEarth) / ext - margin).toLong)
    val x1 = clamp(math.floor((box.maxX + HalfEarth) / ext + margin).toLong)
    val y0 = clamp(math.floor((HalfEarth - box.maxY) / ext - margin).toLong)
    val y1 = clamp(math.floor((HalfEarth - box.minY) / ext + margin).toLong)
    for (tx <- x0 to x1; ty <- y0 to y1) yield (tx, ty)
  }

  /** raster-union strategy: per (tile, param) paint → open/close →
    * trace. `df` needs an EWKB geometry column (3857) and optionally a
    * group-by column (the strategy's `group_by_column`). Output: one
    * row per traced polygon (x, y, param, geom EWKB, area, painted_px
    * of its canvas). */
  def rasterUnion(df: DataFrame, geomCol: String, paramCol: Option[String],
      cfg: Config): DataFrame = {
    val spark = df.sparkSession
    implicit val binnedEnc: Encoder[Binned] = Encoders.product[Binned]
    implicit val traceEnc: Encoder[TraceRow] = Encoders.product[TraceRow]
    implicit val keyEnc: Encoder[(Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)

    val zoom = cfg.zoom
    val margin = cfg.effectiveMargin
    val tilesUdf = udf((ewkb: Array[Byte]) =>
      if (ewkb == null) Seq.empty[(Long, Long)]
      else Box.of(Ewkb.decode(ewkb)).toSeq
        .flatMap(b => tilesForBox(b, zoom, margin)))

    val withParam = paramCol match {
      case Some(c) => df.select(col(geomCol).as("g"), col(c).cast("string").as("p"))
      case None    => df.select(col(geomCol).as("g"), lit("").as("p"))
    }
    val binned = withParam
      .select(explode(tilesUdf(col("g"))).as("t"), col("p"), col("g"))
      .select(col("t._1").as("x"), col("t._2").as("y"),
        col("p").as("param"), col("g").as("ewkb"))
      .as[Binned]

    binned.groupByKey(b => (b.x, b.y, b.param))
      .flatMapGroups { (k: (Long, Long, String), rows: Iterator[Binned]) =>
        val (tx, ty, param) = k
        val tile = GenTile(zoom, tx, ty)
        val canvas = new Canvas(cfg.imageExtent, cfg.imageBuffer)
        rows.foreach(r => canvas.draw(Ewkb.decode(r.ewkb), tile))
        canvas.openClose(cfg.bufferSize)
        val px = canvas.paintedPixels
        Tracer.trace(canvas, tile, cfg.turdsize, cfg.minArea).map { poly =>
          TraceRow(tx, ty, param, Ewkb.encode(poly),
            math.abs(GeomOps.area(poly)), px)
        }
      }
      .toDF()
  }

  /** builtup strategy: N source layers each painted on its own canvas
    * with its own open/close buffer, merged (bitwise OR), traced once
    * (gen-tile-builtup.cpp:179-266). `df` needs a `src` discriminator
    * column; `bufferSizes(src)` gives the per-layer buffer. */
  def builtup(df: DataFrame, geomCol: String, srcCol: String,
      bufferSizes: Map[String, Int], cfg: Config): DataFrame = {
    implicit val binnedEnc: Encoder[Binned] = Encoders.product[Binned]
    implicit val traceEnc: Encoder[TraceRow] = Encoders.product[TraceRow]
    implicit val keyEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

    val zoom = cfg.zoom
    val margin = cfg.effectiveMargin
    val tilesUdf = udf((ewkb: Array[Byte]) =>
      if (ewkb == null) Seq.empty[(Long, Long)]
      else Box.of(Ewkb.decode(ewkb)).toSeq
        .flatMap(b => tilesForBox(b, zoom, margin)))

    val binned = df
      .select(col(geomCol).as("g"), col(srcCol).cast("string").as("p"))
      .select(explode(tilesUdf(col("g"))).as("t"), col("p"), col("g"))
      .select(col("t._1").as("x"), col("t._2").as("y"),
        col("p").as("param"), col("g").as("ewkb"))
      .as[Binned]

    binned.groupByKey(b => (b.x, b.y))
      .flatMapGroups { (k: (Long, Long), rows: Iterator[Binned]) =>
        val (tx, ty) = k
        val tile = GenTile(zoom, tx, ty)
        val canvases = mutable.LinkedHashMap.empty[String, Canvas]
        rows.foreach { r =>
          val c = canvases.getOrElseUpdate(r.param,
            new Canvas(cfg.imageExtent, cfg.imageBuffer))
          c.draw(Ewkb.decode(r.ewkb), tile)
        }
        canvases.foreach { case (src, c) =>
          c.openClose(bufferSizes.getOrElse(src, cfg.bufferSize))
        }
        val merged = canvases.values.reduceLeftOption { (a, b) =>
          a.merge(b); a
        }
        merged.toSeq.flatMap { c =>
          val px = c.paintedPixels
          Tracer.trace(c, tile, cfg.turdsize, cfg.minArea).map { poly =>
            TraceRow(tx, ty, "", Ewkb.encode(poly),
              math.abs(GeomOps.area(poly)), px)
          }
        }
      }
      .toDF()
  }
}
