package graft.geom

import scala.collection.mutable

/** N-ary boolean polygon union — the vector half of the reference's
  * generalization dissolve (`ST_Union` pushed down to PostGIS at
  * src/gen/gen-tile-vector.cpp:41-60; here a native implementation so
  * the operator runs inside Spark executors with no database).
  *
  * Algorithm (overlay by segment arrangement + coverage
  * classification):
  *  1. collect every ring segment of every input polygon;
  *  2. split all segments at pairwise intersections and at endpoints
  *     of other segments lying on them — each intersection point is
  *     computed ONCE and shared by both segments, so split endpoints
  *     match bitwise and ring stitching can use exact keys;
  *  3. classify each sub-segment by the coverage count (number of
  *     input polygons containing a probe point) immediately left and
  *     right of its midpoint: boundary iff exactly one side has
  *     coverage zero; orient interior-left;
  *  4. stitch boundary segments into rings, taking the leftmost
  *     (most counterclockwise) turn at junctions — this traces
  *     tightest faces so touching rings don't fuse incorrectly;
  *  5. CCW rings are outers, CW rings are holes; holes attach to the
  *     smallest containing outer.
  *
  * Probe offsets are `1e-9 × bbox-diagonal` — features closer than
  * that to each other may misclassify (documented tolerance; the
  * dissolve use-case feeds buffered geometries where this is far
  * below the buffer margin).
  */
object PolyUnion {

  private final case class Seg(a: Pt, b: Pt) {
    def reversed: Seg = Seg(b, a)
  }

  /** n-ary union of polygons. */
  def union(polys: Seq[Polygon]): Geometry = {
    val valid = polys.filter(p => p.outer.pts.size >= 4)
    if (valid.size == 1) valid.head
    else if (valid.isEmpty) // keep the inputs' SRID even when all degenerate
      NullGeom(polys.headOption.map(_.srid).getOrElse(Srid.WGS84))
    else overlay(valid, Nil, (ca, _) => ca > 0)
  }

  /** (∪ a) minus (∪ b). */
  def difference(a: Seq[Polygon], b: Seq[Polygon]): Geometry =
    overlay(a, b, (ca, cb) => ca > 0 && cb == 0)

  /** (∪ a) intersect (∪ b). */
  def intersection(a: Seq[Polygon], b: Seq[Polygon]): Geometry =
    overlay(a, b, (ca, cb) => ca > 0 && cb > 0)

  /** General overlay: boundary of the region where
    * `inside(coverageA, coverageB)` holds, coverages counted over the
    * two input sets independently. */
  private def overlay(polysA: Seq[Polygon], polysB: Seq[Polygon],
      inside: (Int, Int) => Boolean): Geometry = {
    val srid = (polysA ++ polysB).headOption.map(_.srid).getOrElse(Srid.WGS84)
    val validA = polysA.filter(p => p.outer.pts.size >= 4)
    val validB = polysB.filter(p => p.outer.pts.size >= 4)
    if (validA.isEmpty && validB.isEmpty) return NullGeom(srid)

    // 1. segments (both sets feed the arrangement)
    val segs = mutable.ArrayBuffer.empty[Seg]
    (validA ++ validB).foreach { p =>
      (p.outer +: p.inners).foreach { r =>
        val pts = if (r.pts.head == r.pts.last) r.pts else r.pts :+ r.pts.head
        pts.iterator.zip(pts.iterator.drop(1)).foreach { case (a, b) =>
          if (a != b) segs += Seg(a, b)
        }
      }
    }
    if (segs.isEmpty) return NullGeom(srid)

    // bbox-relative probe offset
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    segs.foreach { s =>
      minX = math.min(minX, math.min(s.a.x, s.b.x))
      minY = math.min(minY, math.min(s.a.y, s.b.y))
      maxX = math.max(maxX, math.max(s.a.x, s.b.x))
      maxY = math.max(maxY, math.max(s.a.y, s.b.y))
    }
    val diag = math.hypot(maxX - minX, maxY - minY)
    val eps = math.max(diag * 1e-9, java.lang.Double.MIN_NORMAL)

    // 2. split points per segment (param-sorted); intersections shared
    val splits = Array.fill(segs.size)(mutable.ArrayBuffer.empty[(Double, Pt)])

    def onSegment(p: Pt, s: Seg): Option[Double] = {
      val dx = s.b.x - s.a.x; val dy = s.b.y - s.a.y
      val len2 = dx * dx + dy * dy
      if (len2 == 0) return None
      val cross = (p.x - s.a.x) * dy - (p.y - s.a.y) * dx
      if (math.abs(cross) > eps * math.sqrt(len2)) return None
      val t = ((p.x - s.a.x) * dx + (p.y - s.a.y) * dy) / len2
      if (t > 1e-12 && t < 1 - 1e-12) Some(t) else None
    }

    // Candidate pruning: uniform grid over segment bboxes — only
    // segments sharing a cell are intersection-tested, turning the
    // naive O(n²) pair loop into ~O(n) for typical arrangements (the
    // negative-buffer pass feeds tens of thousands of short segments).
    val avgLen = segs.iterator
      .map(s => math.hypot(s.b.x - s.a.x, s.b.y - s.a.y)).sum / segs.size
    val cell = math.max(avgLen * 2, diag / 1024)
    val grid = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
    def cellsOf(s: Seg): Iterator[Long] = {
      val x0 = (math.min(s.a.x, s.b.x) / cell).toLong
      val x1 = (math.max(s.a.x, s.b.x) / cell).toLong
      val y0 = (math.min(s.a.y, s.b.y) / cell).toLong
      val y1 = (math.max(s.a.y, s.b.y) / cell).toLong
      for (cx <- (x0 to x1).iterator; cy <- y0 to y1)
        yield cx * 0x100000001L + cy
    }
    segs.indices.foreach { k =>
      cellsOf(segs(k)).foreach(c =>
        grid.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += k)
    }

    def intersectPair(i: Int, j: Int): Unit = {
      val s1 = segs(i); val s2 = segs(j)
      val d1x = s1.b.x - s1.a.x; val d1y = s1.b.y - s1.a.y
      val d2x = s2.b.x - s2.a.x; val d2y = s2.b.y - s2.a.y
      val denom = d1x * d2y - d1y * d2x
      if (denom != 0) {
        val t = ((s2.a.x - s1.a.x) * d2y - (s2.a.y - s1.a.y) * d2x) / denom
        val u = ((s2.a.x - s1.a.x) * d1y - (s2.a.y - s1.a.y) * d1x) / denom
        if (t > 1e-12 && t < 1 - 1e-12 && u > 1e-12 && u < 1 - 1e-12) {
          // proper crossing: one shared point instance for both
          val p = Pt(s1.a.x + t * d1x, s1.a.y + t * d1y)
          splits(i) += ((t, p))
          splits(j) += ((u, p))
        }
      }
      // endpoint-on-segment (covers collinear partial overlap since
      // each endpoint inside the other segment splits it)
      onSegment(s2.a, s1).foreach(t => splits(i) += ((t, s2.a)))
      onSegment(s2.b, s1).foreach(t => splits(i) += ((t, s2.b)))
      onSegment(s1.a, s2).foreach(u => splits(j) += ((u, s1.a)))
      onSegment(s1.b, s2).foreach(u => splits(j) += ((u, s1.b)))
    }

    val done = mutable.HashSet.empty[Long]
    grid.valuesIterator.foreach { bucket =>
      var bi = 0
      while (bi < bucket.size) {
        var bj = bi + 1
        while (bj < bucket.size) {
          val i = math.min(bucket(bi), bucket(bj))
          val j = math.max(bucket(bi), bucket(bj))
          if (i != j && done.add(i.toLong * segs.size + j))
            intersectPair(i, j)
          bj += 1
        }
        bi += 1
      }
    }

    // snap endpoints to a grid ~3 orders below the probe offset: the
    // same geometric point reached via different segment pairs (triple
    // intersections at tangencies) differs in the last ulps — snapping
    // collapses those to one exact stitching key. The grid is a POWER
    // OF TWO (2^(e-40) ≈ diag·9e-13) so scaling is exact and values
    // already on a coarser binary grid (typical input coordinates)
    // pass through bit-identical.
    val q = math.scalb(1.0, math.max(java.lang.Math.getExponent(diag), -960) - 40)
    def snap(p: Pt): Pt = Pt(math.rint(p.x / q) * q, math.rint(p.y / q) * q)

    val pieces = mutable.ArrayBuffer.empty[Seg]
    var i = 0
    while (i < segs.size) {
      val s = segs(i)
      val pts = (Seq((0.0, s.a)) ++ splits(i).sortBy(_._1).map(x => (x._1, x._2))
        :+ ((1.0, s.b))).map(x => snap(x._2))
      pts.iterator.zip(pts.iterator.drop(1)).foreach { case (a, b) =>
        if (a != b) pieces += Seg(a, b)
      }
      i += 1
    }

    // 3. coverage classification (bbox prefilter per polygon: probes
    // run once per sub-segment side, over possibly thousands of polys)
    def withBoxes(ps: Seq[Polygon]): Array[(Polygon, Box)] =
      ps.iterator.map(p => (p, p.outer.pts.foldLeft(Box.empty)(_.extend(_))))
        .toArray
    val boxedA = withBoxes(validA)
    val boxedB = withBoxes(validB)
    def containsP(poly: Polygon, p: Pt): Boolean =
      FromOsm.pointInRing(p, poly.outer) &&
        !poly.inners.exists(FromOsm.pointInRing(p, _))
    // grid-index the polygons as well (buffer passes probe thousands
    // of small local shapes); wide polygons fall into a linear list
    def probeCounter(boxed: Array[(Polygon, Box)]): Pt => Int = {
      if (boxed.length <= 16) { p =>
        var c = 0; var k = 0
        while (k < boxed.length) {
          if (boxed(k)._2.contains(p) && containsP(boxed(k)._1, p)) c += 1
          k += 1
        }
        c
      } else {
        val byCell = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
        val wide = mutable.ArrayBuffer.empty[Int]
        boxed.indices.foreach { k =>
          val b = boxed(k)._2
          val x0 = (b.minX / cell).toLong; val x1 = (b.maxX / cell).toLong
          val y0 = (b.minY / cell).toLong; val y1 = (b.maxY / cell).toLong
          if ((x1 - x0 + 1) * (y1 - y0 + 1) > 4096) wide += k
          else for (cx <- x0 to x1; cy <- y0 to y1)
            byCell.getOrElseUpdate(cx * 0x100000001L + cy,
              mutable.ArrayBuffer.empty) += k
        }
        p => {
          var c = 0
          var k = 0
          while (k < wide.size) {
            val e = boxed(wide(k))
            if (e._2.contains(p) && containsP(e._1, p)) c += 1
            k += 1
          }
          val key = (p.x / cell).toLong * 0x100000001L + (p.y / cell).toLong
          byCell.get(key).foreach { cands =>
            var ci = 0
            while (ci < cands.size) {
              val e = boxed(cands(ci))
              if (e._2.contains(p) && containsP(e._1, p)) c += 1
              ci += 1
            }
          }
          c
        }
      }
    }
    val countA = probeCounter(boxedA)
    val countB = probeCounter(boxedB)
    def insideAt(p: Pt): Boolean = inside(countA(p), countB(p))

    val boundary = mutable.ArrayBuffer.empty[Seg]
    val seen = mutable.HashSet.empty[(Pt, Pt)]
    pieces.foreach { s =>
      val mx = (s.a.x + s.b.x) / 2; val my = (s.a.y + s.b.y) / 2
      val len = math.hypot(s.b.x - s.a.x, s.b.y - s.a.y)
      if (len > 0) {
        // unit left normal of a→b
        val nx = -(s.b.y - s.a.y) / len; val ny = (s.b.x - s.a.x) / len
        val inL = insideAt(Pt(mx + nx * eps, my + ny * eps))
        val inR = insideAt(Pt(mx - nx * eps, my - ny * eps))
        val oriented =
          if (inL && !inR) Some(s)
          else if (inR && !inL) Some(s.reversed)
          else None // interior edge (both inside) or exterior (both out)
        // coincident copies (identical inputs, shared same-orientation
        // edges) classify identically — keep one
        oriented.foreach { o =>
          if (seen.add((o.a, o.b))) boundary += o
        }
      }
    }

    // 4. stitch, leftmost turn first
    val out = mutable.HashMap.empty[Pt, mutable.ArrayBuffer[Int]]
    boundary.zipWithIndex.foreach { case (s, k) =>
      out.getOrElseUpdate(s.a, mutable.ArrayBuffer.empty) += k
    }
    val used = new Array[Boolean](boundary.size)

    def angle(s: Seg): Double = math.atan2(s.b.y - s.a.y, s.b.x - s.a.x)

    val rings = mutable.ArrayBuffer.empty[Vector[Pt]]
    var k = 0
    while (k < boundary.size) {
      if (!used(k)) {
        val ring = Vector.newBuilder[Pt]
        var cur = boundary(k)
        val startPt = cur.a
        used(k) = true
        ring += cur.a
        var guard = 0
        while (cur.b != startPt && guard <= boundary.size) {
          ring += cur.b
          val inAngle = angle(cur)
          val nexts = out.getOrElse(cur.b, mutable.ArrayBuffer.empty)
            .filterNot(used)
          if (nexts.isEmpty) { guard = boundary.size + 1 } // open chain
          else {
            // leftmost turn: maximize CCW angle from reversed incoming
            val next = nexts.maxBy { n =>
              val d = angle(boundary(n)) - (inAngle + math.Pi)
              val norm = d - 2 * math.Pi * math.floor(d / (2 * math.Pi))
              // exclude going straight back unless it's the only option
              if (norm < 1e-12 && nexts.size > 1) -1.0 else norm
            }
            used(next) = true
            cur = boundary(next)
          }
          guard += 1
        }
        if (cur.b == startPt) {
          val r = ring.result() :+ startPt
          if (r.size >= 4) rings += r
        }
      }
      k += 1
    }

    // 5. orientation: CCW (positive shoelace) outer, CW hole
    def shoelace(ps: Vector[Pt]): Double = {
      var s = 0.0
      var n = 1
      while (n < ps.size) {
        s += ps(n - 1).x * ps(n).y - ps(n).x * ps(n - 1).y
        n += 1
      }
      s / 2
    }
    val outers = mutable.ArrayBuffer.empty[(Vector[Pt], Double)]
    val holes = mutable.ArrayBuffer.empty[Vector[Pt]]
    rings.foreach { r =>
      val a = shoelace(r)
      if (a > 0) outers += ((r, a)) else if (a < 0) holes += r
    }
    if (outers.isEmpty) return NullGeom(srid)

    val withHoles = outers.map { case (o, a) =>
      (o, a, mutable.ArrayBuffer.empty[Vector[Pt]])
    }
    holes.foreach { h =>
      // probe near the hole's first edge: midpoint offset left. Boundary
      // edges are oriented interior-left, so the probe lands in the UNION
      // interior — which is inside any outer ring that contains the hole.
      // (Either side would work here: both sides of a hole edge are inside
      // the containing outer ring, and pointInRing below tests only the
      // candidate OUTER ring, not hole membership.)
      val a = h(0); val b = h(1)
      val len = math.hypot(b.x - a.x, b.y - a.y)
      val probe = Pt((a.x + b.x) / 2 - (b.y - a.y) / len * eps,
        (a.y + b.y) / 2 + (b.x - a.x) / len * eps)
      val cands = withHoles.filter { case (o, _, _) =>
        FromOsm.pointInRing(probe, Ring(o))
      }
      if (cands.nonEmpty) cands.minBy(_._2)._3 += h
    }

    val result = withHoles.map { case (o, _, hs) =>
      Polygon(Ring(o), hs.map(Ring(_)).toVector, srid)
    }.toVector
    if (result.size == 1) result.head else MultiPolygon(result, srid)
  }
}
