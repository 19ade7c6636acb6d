package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geom._

/** Geometry → dirty-tile cover (reference: src/expire-tiles.cpp
  * 55-330): the exact per-geometry algorithms —
  *  - points: buffered box around the containing tile;
  *  - lines: 0.4-tile stepped walk along each segment, box-expiring
  *    each step (with the date-line wrap rule);
  *  - polygons: boundary walk plus, in full-area mode, the scanline
  *    fill (row intersections sorted, fill between entry/exit pairs);
  *  - hybrid mode: full-area unless the envelope exceeds
  *    full_area_limit (expire-config.hpp:5-40).
  *
  * Geometry must be in 3857 (the reference only expires 3857 output,
  * from_geometry_if_3857). Pure function per geometry → used as a
  * flatMap/UDF; the cluster-wide dedup stays a DataFrame distinct.
  */
object TileCover {

  sealed trait Mode
  case object BoundaryOnly extends Mode
  case object FullArea extends Mode
  /** boundary if envelope wider/taller than fullAreaLimit (meters). */
  final case class Hybrid(fullAreaLimit: Double = 10000.0) extends Mode

  final case class Config(zoom: Int, mode: Mode = FullArea, buffer: Double = 0.1)

  private val EC = graft.functions.TileFunctions.EarthCircumference

  def cover(g: Geometry, cfg: Config): Set[(Long, Long)] = {
    val mapWidth = 1L << cfg.zoom
    val dirty = mutable.Set.empty[(Long, Long)]

    def coordsToTile(p: Pt): (Double, Double) =
      (mapWidth * (0.5 + p.x / EC), mapWidth * (0.5 - p.y / EC))

    def normX(x: Long): Long = {
      val m = x % mapWidth
      if (m < 0) (mapWidth - m) + 1 else m
    }

    // Reference expire_tile takes normalise_tile_x_coord's result as-is
    // (expire-tiles.cpp:55-62,94,314) — no further wrapping.
    def expire(x: Long, y: Long): Unit =
      if (y >= 0 && y < mapWidth) dirty += ((normX(x), y))

    def point(p: Pt): Unit = {
      val (tx, ty) = coordsToTile(p)
      val ymin = math.max(0L, (ty - cfg.buffer).toLong)
      val ymax = math.min(mapWidth - 1, (ty + cfg.buffer).toLong)
      var x = (tx - cfg.buffer).toLong
      while (x <= (tx + cfg.buffer).toLong) {
        var y = ymin
        while (y <= ymax) { expire(x, y); y += 1 }
        x += 1
      }
    }

    def segment(a0: Pt, b0: Pt): Unit = {
      var (ax, ay) = coordsToTile(a0)
      var (bx, by) = coordsToTile(b0)
      if (ax > bx) { val t = (ax, ay); ax = bx; ay = by; bx = t._1; by = t._2 }
      // x_len is fixed BEFORE the date-line adjustment and deliberately
      // not recomputed after it, mirroring expire-tiles.cpp:280-292
      // (const x_len feeds hyp/x_step even when the endpoints are
      // wrapped+swapped; the walked x coords normalise later).
      val xLen = bx - ax
      if (xLen > mapWidth / 2) { // date-line crossing
        val nax = ax + mapWidth
        val t = (nax, ay); ax = bx; ay = by; bx = t._1; by = t._2
      }
      val yLen = by - ay
      val hyp = math.sqrt(xLen * xLen + yLen * yLen)
      if (hyp == 0) { point(a0); return }
      val xStep = xLen / hyp; val yStep = yLen / hyp
      var i = 0
      while (i <= (hyp / 0.4).toInt) {
        val step = i * 0.4
        val next = math.min(hyp, (i + 1) * 0.4)
        val x1 = ax + step * xStep
        var y1 = ay + step * yStep
        val x2 = ax + next * xStep
        var y2 = ay + next * yStep
        if (y1 > y2) { val t = y1; y1 = y2; y2 = t }
        var x = (x1 - cfg.buffer).toLong
        while (x <= (x2 + cfg.buffer).toLong) {
          var y = (y1 - cfg.buffer).toLong
          while (y <= (y2 + cfg.buffer).toLong) { expire(x, y); y += 1 }
          x += 1
        }
        i += 1
      }
    }

    def pointList(ps: Seq[Pt]): Unit =
      ps.iterator.zip(ps.iterator.drop(1)).foreach { case (a, b) =>
        segment(a, b)
      }

    def polygonFill(poly: Polygon): Unit = {
      val box = Box.of(poly).get
      val maxTileY = (mapWidth * (0.5 - box.minY / EC)).toLong
      val minTileY = (mapWidth * (0.5 - box.maxY / EC)).toLong
      var tileY = minTileY
      while (tileY < maxTileY) {
        val xs = mutable.ArrayBuffer.empty[Long]
        def ringCrossings(r: Ring): Unit = {
          var i = 1
          while (i < r.pts.size) {
            val (x1, y1) = coordsToTile(r.pts(i))
            val (x2, y2) = coordsToTile(r.pts(i - 1))
            val ty = tileY.toDouble
            if ((y1 < ty && y2 >= ty) || (y2 < ty && y1 >= ty)) {
              val pos = (ty - y1) / (y2 - y1) * (x2 - x1)
              xs += math.max(0.0,
                math.min((mapWidth - 1).toDouble, x1 + pos)).toLong
            }
            i += 1
          }
        }
        ringCrossings(poly.outer)
        poly.inners.foreach(ringCrossings)
        val sorted = xs.sorted
        var i = 0
        while (i + 1 < sorted.size) {
          if (sorted(i) < mapWidth - 1 && sorted(i + 1) > 0) {
            var x = sorted(i)
            while (x <= sorted(i + 1)) { expire(x, tileY); x += 1 }
          }
          i += 2
        }
        tileY += 1
      }
    }

    def decideFullArea(g: Geometry): Boolean = cfg.mode match {
      case FullArea     => true
      case BoundaryOnly => false
      case Hybrid(limit) =>
        Box.of(g).exists(b =>
          (b.maxX - b.minX) <= limit && (b.maxY - b.minY) <= limit)
    }

    def walk(g: Geometry): Unit = g match {
      case _: NullGeom       => ()
      case Point(p, _)       => point(p)
      case LineString(ps, _) => pointList(ps)
      case MultiPoint(ps, _) => ps.foreach(p => point(p.pt))
      case MultiLineString(ls, _) => ls.foreach(l => pointList(l.pts))
      case p: Polygon =>
        pointList(p.outer.pts); p.inners.foreach(r => pointList(r.pts))
        if (decideFullArea(p)) polygonFill(p)
      case MultiPolygon(ps, _)       => ps.foreach(walk)
      case GeometryCollection(gs, _) => gs.foreach(walk)
    }

    walk(g)
    dirty.toSet
  }

  /** DataFrame form: dirty tiles of an EWKB geometry column, deduped
    * cluster-wide. */
  def geometryCover(df: DataFrame, geomCol: Column, cfg: Config): DataFrame = {
    val coverUdf = udf((b: Array[Byte]) =>
      if (b == null) Seq.empty[(Long, Long)]
      else cover(Ewkb.decode(b), cfg).toSeq)
    df.select(explode(coverUdf(geomCol)).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"))
      .distinct()
      .withColumn("zoom", lit(cfg.zoom))
  }

  /** geometryCover with the per-geometry tile cap applied
    * distributed: a geometry whose cover exceeds the cap contributes
    * nothing (the reference's "Tile limit reached for single
    * geometry" skip) — the declarative guard against one pathological
    * geometry exploding the tile set. The sequential overall cap
    * needs [[limitedCover]]. */
  def geometryCoverCapped(df: DataFrame, geomCol: Column, cfg: Config,
      maxTilesPerGeometry: Long): DataFrame = {
    val coverUdf = udf((b: Array[Byte]) =>
      if (b == null) Seq.empty[(Long, Long)]
      else cover(Ewkb.decode(b), cfg).toSeq)
    df.select(coverUdf(geomCol).as("__t"))
      .where(size(col("__t")) <= maxTilesPerGeometry)
      .select(explode(col("__t")).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"))
      .distinct()
      .withColumn("zoom", lit(cfg.zoom))
  }

  /** The expire output's two tile caps (src/expire-output.hpp:24-25
    * defaults; enforcement src/expire-output.cpp:20-51). */
  final case class Limits(maxTilesPerGeometry: Long = 10000000L,
      maxTilesOverall: Long = 50000000L)

  /** `packed` holds (x << 32 | y) per tile — primitive longs, ~16
    * bytes/tile in the accumulation set vs ~100 for boxed tuples, so
    * the default 50M-tile overall cap fits a normal driver heap like
    * the reference's int64 set does. Unpack via [[LimitedCover.tiles]]
    * (small results / tests) or stream `packed` directly. */
  final case class LimitedCover(packed: Array[Long],
      geometryLimitHits: Long, overallLimitReached: Boolean) {
    def tiles: Set[(Long, Long)] =
      packed.iterator.map(p => (p >>> 32, p & 0xffffffffL)).toSet
  }

  /** Capped accumulation (expire_output_t::add_dirty_tiles,
    * src/expire-output.cpp:20-51): a geometry whose own cover exceeds
    * maxTilesPerGeometry contributes nothing ("Tile limit reached for
    * single geometry"); once a geometry's tiles would push the
    * accumulated set past maxTilesOverall, that geometry AND all later
    * ones are dropped ("Overall tile limit reached"), keeping what was
    * already accumulated — the reference's exact early-out.
    *
    * The per-geometry covers are computed distributed; the ordered
    * accumulation streams per-geometry tile sets to the driver via
    * toLocalIterator and stops consuming at the overall cap, so driver
    * memory is bounded by maxTilesOverall — the same bound the
    * reference's in-memory tile set has.
    */
  def limitedCover(df: DataFrame, orderCol: Column, geomCol: Column,
      cfg: Config, limits: Limits): LimitedCover = {
    // tiles packed to (x << 32 | y) in the UDF: the driver fold stays
    // on primitive longs end to end
    val coverUdf = udf((b: Array[Byte]) =>
      if (b == null) Array.empty[Long]
      else cover(Ewkb.decode(b), cfg)
        .iterator.map { case (x, y) => (x << 32) | y }.toArray)
    accumulateCapped(
      df.select(orderCol.as("__ord"), coverUdf(geomCol).as("__t")), limits)
  }

  /** Per-OBJECT tile set for the append flow, exactly the reference's
    * do_expire contract (src/flex-table-column.cpp:298-345 +
    * output-flex.cpp:941,1012 vs 1143-1244): the old/new geometry
    * LISTS of one object (its geometry_cache) cover both sides fully
    * unless the object is a DEPENDENT re-render (`direct` false) with
    * diff_expire on and both sides non-empty — then only the
    * symmetric difference of the collected sets dirties tiles.
    * Returns packed (x<<32|y) tiles. */
  def pairTiles(cfg: Config, symDiff: Boolean)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((o: Seq[Array[Byte]], n: Seq[Array[Byte]], direct: Boolean) => {
      def decode(s: Seq[Array[Byte]]): Vector[Geometry] =
        Option(s).getOrElse(Seq.empty).filter(_ != null)
          .map(Ewkb.decode).filterNot(_.isNull).toVector
      val oldGs = decode(o)
      val newGs = decode(n)
      val separate = !symDiff || direct || oldGs.isEmpty || newGs.isEmpty
      val tiles: Set[(Long, Long)] =
        if (separate) (oldGs ++ newGs).flatMap(g => cover(g, cfg)).toSet
        else symDiffTiles(
          GeometryCollection(oldGs, oldGs.head.srid),
          GeometryCollection(newGs, newGs.head.srid), cfg)
      tiles.iterator.map { case (x, y) => (x << 32) | y }.toArray
    })

  /** [[limitedCover]]'s capped accumulation over [[pairTiles]] rows:
    * `df` must carry `__ord` and the packed-tile array `__t`. */
  def limitedCoverPacked(df: DataFrame, limits: Limits): LimitedCover =
    accumulateCapped(df, limits)

  /** The capped sequential fold shared by the limited-cover forms:
    * one distributed pass computes per-geometry tile sets; oversize
    * rows ship only their size (empty tile array) to the driver. */
  private def accumulateCapped(perRow: DataFrame, limits: Limits)
      : LimitedCover = {
    val perGeom = perRow
      .where(size(col("__t")) > 0)
      .select(col("__ord"), size(col("__t")).as("__n"),
        when(size(col("__t")) <= limits.maxTilesPerGeometry, col("__t"))
          .otherwise(array().cast("array<long>")).as("__tiles"))
      .orderBy(col("__ord"))
    val acc = mutable.LongMap.empty[Unit] // unboxed keys
    var geomHits = 0L
    var overall = false
    val it = perGeom.toLocalIterator()
    // the reference's exact early-out: once the overall limit trips,
    // later geometries are not processed at all (no per-geometry
    // warnings either, src/expire-output.cpp:25-27)
    while (!overall && it.hasNext) {
      val row = it.next()
      val n = row.getInt(1)
      if (n > limits.maxTilesPerGeometry) geomHits += 1
      else if (n + acc.size > limits.maxTilesOverall) overall = true
      else row.getSeq[Long](2).foreach(t => acc.update(t, ()))
    }
    LimitedCover(acc.keysIterator.toArray, geomHits, overall)
  }

  /** Geometric diff expire (find_difference + do_expire,
    * src/flex-table-column.cpp:267-363): with diff_expire enabled, a
    * modified row dirties only the SYMMETRIC DIFFERENCE of its old and
    * new geometries — the unchanged shared parts stay clean. Points
    * diff exactly; linestrings diff at segment granularity (segments
    * shared by both sides drop out; partially-overlapping segments are
    * kept whole, which over-expires — safe for invalidation); polygons
    * use the real boolean overlay. Falls back to covering both sides
    * when either is missing (insert/delete), like always_separate. */
  def symDiffTiles(oldG: Geometry, newG: Geometry,
      cfg: Config): Set[(Long, Long)] = {
    def pts(g: Geometry): Vector[Pt] = g match {
      case Point(p, _)        => Vector(p)
      case MultiPoint(ps, _)  => ps.map(_.pt)
      case GeometryCollection(gs, _) => gs.flatMap(pts)
      case _                  => Vector.empty
    }
    def segs(g: Geometry): Vector[(Pt, Pt)] = g match {
      case LineString(p, _) =>
        p.sliding(2).collect { case Seq(a, b) =>
          if (a.x < b.x || (a.x == b.x && a.y <= b.y)) (a, b) else (b, a)
        }.toVector
      case MultiLineString(ls, _) => ls.flatMap(segs)
      case GeometryCollection(gs, _) => gs.flatMap(segs)
      case _ => Vector.empty
    }
    def polys(g: Geometry): Vector[Polygon] = g match {
      case p: Polygon          => Vector(p)
      case MultiPolygon(ps, _) => ps
      case GeometryCollection(gs, _) => gs.flatMap(polys)
      case _                   => Vector.empty
    }
    val srid = oldG.srid
    val pDiff = (pts(oldG).toSet diff pts(newG).toSet) ++
      (pts(newG).toSet diff pts(oldG).toSet)
    val oldSegs = segs(oldG).toSet
    val newSegs = segs(newG).toSet
    val sDiff = (oldSegs diff newSegs) ++ (newSegs diff oldSegs)
    val po = polys(oldG)
    val pn = polys(newG)
    val polyDiff: Seq[Geometry] =
      if (po.isEmpty && pn.isEmpty) Nil
      else Seq(PolyUnion.difference(po, pn), PolyUnion.difference(pn, po))

    pDiff.flatMap(p => cover(Point(p, srid), cfg)) ++
      sDiff.flatMap { case (a, b) =>
        cover(LineString(Vector(a, b), srid), cfg)
      } ++
      polyDiff.flatMap {
        case _: NullGeom => Set.empty[(Long, Long)]
        case g           => cover(g, cfg)
      }
  }

  /** DataFrame form of diff expire: rows with both geometries dirty
    * only their geometric difference; inserts/deletes (one side null)
    * dirty the side they have. */
  def symDiffCover(df: DataFrame, oldGeom: Column, newGeom: Column,
      cfg: Config): DataFrame = {
    val u = udf((o: Array[Byte], n: Array[Byte]) => (o, n) match {
      case (null, null) => Seq.empty[(Long, Long)]
      case (null, b)    => cover(Ewkb.decode(b), cfg).toSeq
      case (b, null)    => cover(Ewkb.decode(b), cfg).toSeq
      case (ob, nb)     =>
        symDiffTiles(Ewkb.decode(ob), Ewkb.decode(nb), cfg).toSeq
    })
    df.select(explode(u(oldGeom, newGeom)).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"))
      .distinct()
      .withColumn("zoom", lit(cfg.zoom))
  }

  /** Diff expiry for modified rows (reference: geometry_cache_t old/new
    * pairs, src/flex-table-column.hpp:186-213; diff mode in stage 1c,
    * src/output-flex.hpp:218-223): a changed row dirties the tiles of
    * BOTH its previous and its new geometry — deletes have only an old
    * geometry, inserts only a new one (null-safe). One scan, one
    * distinct; the per-row cover UDF caps fan-out exactly like the
    * single-geometry form. */
  def diffCover(df: DataFrame, oldGeom: Column, newGeom: Column,
      cfg: Config): DataFrame = {
    val coverUdf = udf((b: Array[Byte]) =>
      if (b == null) Seq.empty[(Long, Long)]
      else cover(Ewkb.decode(b), cfg).toSeq)
    df.select(explode(
      array_union(coverUdf(oldGeom), coverUdf(newGeom))).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"))
      .distinct()
      .withColumn("zoom", lit(cfg.zoom))
  }
}
