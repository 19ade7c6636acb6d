package graft.geom

import scala.collection.mutable

/** Geometry construction from the OSM reference graph (reference:
  * src/geom-from-osm.cpp, 286 LoC; exposed to user configs as
  * `object:as_*()`, src/output-flex.cpp:1442-1450).
  *
  * Inputs are already-resolved coordinate sequences (the [[graft
  * .operators.Middle]] joins produce them); these functions implement
  * the per-entity assembly semantics.
  */
object FromOsm {

  /** node → POINT (src/geom-from-osm.cpp:25-44). */
  def createPoint(lon: Double, lat: Double, srid: Int = Srid.WGS84): Geometry =
    Point(Pt(lon, lat), srid)

  /** Remove consecutive duplicate points (src/geom.hpp:133-150). */
  def dedupConsecutive(pts: Seq[Pt]): Vector[Pt] = {
    val out = mutable.ArrayBuffer.empty[Pt]
    pts.foreach(p => if (out.isEmpty || out.last != p) out += p)
    out.toVector
  }

  /** way → LINESTRING: dedup consecutive points, null if fewer than 2
    * remain (src/geom-from-osm.cpp:88-101). */
  def createLineString(pts: Seq[Pt], srid: Int = Srid.WGS84): Geometry = {
    val d = dedupConsecutive(pts)
    if (d.size < 2) NullGeom(srid) else LineString(d, srid)
  }

  // ---- duplicate-segment pair cancellation (the osmium assembler's
  // erase_duplicate_segments, segment_list.hpp:270-305: duplicate
  // segments are erased in PAIRS — of three copies, one survives).
  // Both geometry paths run the assembler (geom-from-osm.cpp:115-120
  // for closed ways, geom-area-assembler.cpp for relations), so a way
  // that walks an edge back and forth still yields its clean ring,
  // and a relation listing the same member twice cancels it out.

  private def unitSegments(pts: Seq[Pt]): Seq[(Pt, Pt)] =
    pts.zip(pts.tail).filter { case (a, b) => a != b }

  private def normSeg(s: (Pt, Pt)): (Pt, Pt) = {
    val (a, b) = s
    if (a.x < b.x || (a.x == b.x && a.y <= b.y)) (a, b) else (b, a)
  }

  private def hasDuplicateSegments(segs: Seq[(Pt, Pt)]): Boolean = {
    val seen = mutable.HashSet.empty[(Pt, Pt)]
    segs.exists(s => !seen.add(normSeg(s)))
  }

  /** Segments surviving pair-erasure (insertion order preserved). */
  private def cancelDuplicatePairs(segs: Seq[(Pt, Pt)]): Seq[(Pt, Pt)] = {
    val counts = mutable.LinkedHashMap.empty[(Pt, Pt), Int]
    segs.foreach { s =>
      val k = normSeg(s)
      counts.update(k, counts.getOrElse(k, 0) + 1)
    }
    counts.iterator.collect {
      case (s, n) if n % 2 == 1 => s
    }.toSeq
  }

  /** closed way → POLYGON via ring building + validity check, null if
    * invalid (src/geom-from-osm.cpp:104-133; assembler
    * src/geom-area-assembler.cpp). Not closed / too few points /
    * self-intersecting → null. Winding normalized to CCW outer.
    * Duplicate segments cancel in pairs first; when that reshapes the
    * walk, the polygon is the largest surviving ring (the reference
    * takes the assembler's first outer ring,
    * geom-from-osm.cpp:122-125). */
  def createPolygon(pts: Seq[Pt], srid: Int = Srid.WGS84): Geometry = {
    val d = dedupConsecutive(pts)
    if (d.size < 4 || d.head != d.last) return NullGeom(srid)
    val segs = unitSegments(d)
    val ring0 =
      if (!hasDuplicateSegments(segs)) Ring(d)
      else assembleRings(cancelDuplicatePairs(segs)) match {
        case Some(rings) if rings.nonEmpty =>
          rings.maxBy(r => math.abs(r.signedArea2x))
        case _ => return NullGeom(srid)
      }
    if (ring0.pts.size < 4) return NullGeom(srid)
    if (selfIntersects(ring0)) return NullGeom(srid)
    if (ring0.signedArea2x == 0.0) return NullGeom(srid)
    Polygon(ccw(ring0), Vector.empty, srid)
  }

  /** way → POINT at 1-based index n (object:as_point(n),
    * src/lua-utils + flex geom transform; geometry-point.feature):
    * n = 0 → null, n > #nodes → null, negative n counts from the end
    * (-1 = last), default/absent n = 1. */
  def pointN(pts: Seq[Pt], n: Int = 1,
      srid: Int = Srid.WGS84): Geometry = {
    val idx = if (n < 0) pts.size + n else n - 1
    if (n == 0 || idx < 0 || idx >= pts.size) NullGeom(srid)
    else Point(pts(idx), srid)
  }

  /** relation member nodes → MULTIPOINT, or POINT when only one
    * (src/geom-from-osm.cpp:136-172). */
  def createMultiPoint(pts: Seq[Pt], srid: Int = Srid.WGS84): Geometry =
    pts match {
      case Seq()  => NullGeom(srid)
      case Seq(p) => Point(p, srid)
      case ps     => MultiPoint(ps.map(Point(_, srid)).toVector, srid)
    }

  /** member ways → MULTILINESTRING; with forceMulti=false a single line
    * stays a LINESTRING (src/geom-from-osm.cpp:175-216). */
  def createMultiLineString(ways: Seq[Seq[Pt]], forceMulti: Boolean = true,
      srid: Int = Srid.WGS84): Geometry = {
    val lines = ways.map(createLineString(_, srid))
      .collect { case l: LineString => l }.toVector
    lines match {
      case Vector()                 => NullGeom(srid)
      case Vector(l) if !forceMulti => l
      case ls                       => MultiLineString(ls, srid)
    }
  }

  /** Ring assembly from a deduplicated segment set — the osmium
    * BasicAssembler's create_rings (basic_assembler.hpp):
    *
    *  - every location must be an endpoint of an EVEN number of
    *    segments, else some ring cannot close (open ring / spike) and
    *    the whole assembly is invalid → None;
    *  - locations where more than two segments meet are "split"
    *    locations: rings touching there are cut into arcs and
    *    re-joined into SIMPLE rings, so e.g. four inner rings
    *    touching pairwise at points decompose into their union
    *    outline plus the enclosed courtyard ring (which lands at even
    *    nesting depth and becomes an additional outer ring — the
    *    12-polygon validgeom fixture, test-output-pgsql-validgeom
    *    .cpp:33);
    *  - ambiguous joins pick the candidate closed walk with the
    *    SMALLEST area for outer rings and the LARGEST for inner rings
    *    (join_connected_rings, basic_assembler.hpp:813-905);
    *  - a zero-area ring invalidates the assembly (relation-changes
    *    .feature: a node move collapsing the ring removes the row).
    */
  private def assembleRings(segs: Seq[(Pt, Pt)]): Option[Vector[Ring]] = {
    val proper = segs.filter { case (a, b) => a != b }
    if (proper.isEmpty) return None
    val n = proper.size
    val adj = mutable.HashMap.empty[Pt, mutable.ArrayBuffer[Int]]
    proper.zipWithIndex.foreach { case ((a, b), i) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += i
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += i
    }
    if (adj.valuesIterator.exists(_.size % 2 == 1)) return None // open ring
    val splitLocs: Set[Pt] =
      adj.iterator.collect { case (p, is) if is.size > 2 => p }.toSet
    val used = Array.fill(n)(false)
    def other(i: Int, p: Pt): Pt = {
      val (a, b) = proper(i); if (a == p) b else a
    }
    /** Walk from `start` through segment i0; stops on returning to
      * `start` or at a split location (add_new_ring_complex). Through
      * 2-valent nodes the continuation is forced. */
    def walk(start: Pt, i0: Int): Option[Vector[Pt]] = {
      val acc = mutable.ArrayBuffer(start)
      used(i0) = true
      var cur = other(i0, start)
      acc += cur
      while (cur != start && !splitLocs.contains(cur)) {
        adj(cur).find(!used(_)) match {
          case Some(nx) => used(nx) = true; cur = other(nx, cur); acc += cur
          case None     => return None // dead end — malformed input
        }
      }
      Some(acc.toVector)
    }
    val closed = mutable.ArrayBuffer.empty[Vector[Pt]]
    val open = mutable.ArrayBuffer.empty[Vector[Pt]]
    // arcs first, from split locations in deterministic order
    splitLocs.toSeq.sortBy(p => (p.x, p.y)).foreach { sl =>
      adj(sl).foreach { i =>
        if (!used(i)) walk(sl, i) match {
          case Some(pts) =>
            if (pts.head == pts.last) closed += pts else open += pts
          case None => return None
        }
      }
    }
    // remaining components have no split nodes: forced closed walks
    (0 until n).foreach { i =>
      if (!used(i)) walk(proper(i)._1, i) match {
        case Some(pts) if pts.head == pts.last => closed += pts
        case _ => return None
      }
    }

    def segOrd(s: (Pt, Pt)): (Double, Double, Double, Double) = {
      val (a, b) = normSeg(s)
      (a.x, a.y, b.x, b.y)
    }
    implicit val ptPairOrd: Ordering[(Double, Double, Double, Double)] =
      Ordering.Tuple4(Ordering.Double.TotalOrdering,
        Ordering.Double.TotalOrdering, Ordering.Double.TotalOrdering,
        Ordering.Double.TotalOrdering)
    def minSegOf(pts: Vector[Pt]): (Pt, Pt) =
      pts.zip(pts.tail).minBy(segOrd)
    def walkArea2x(pts: Vector[Pt]): Double = Ring(pts).signedArea2x

    // join open arcs into closed rings (try_to_merge +
    // join_connected_rings, basic_assembler.hpp:665-905)
    while (open.nonEmpty) {
      // unambiguous first: a location where exactly two arc-ends meet
      val endCount = mutable.HashMap.empty[Pt, Int]
      open.foreach { a =>
        endCount(a.head) = endCount.getOrElse(a.head, 0) + 1
        endCount(a.last) = endCount.getOrElse(a.last, 0) + 1
      }
      endCount.iterator.collect { case (p, 2) => p }
        .toSeq.sortBy(p => (p.x, p.y)).headOption match {
        case Some(loc) =>
          val i1 = open.indexWhere(a => a.head == loc || a.last == loc)
          val i2 = open.indexWhere(
            a => a.head == loc || a.last == loc, i1 + 1)
          val a1 = open(i1)
          val a2 = open(i2)
          val left = if (a1.last == loc) a1 else a1.reverse
          val right = if (a2.head == loc) a2 else a2.reverse
          val merged = left ++ right.tail
          open.remove(i2); open.remove(i1)
          if (merged.head == merged.last) closed += merged
          else open += merged
        case None =>
          // ambiguous: close the arc holding the minimal segment via
          // the best candidate walk over the other open arcs
          val ringMinIdx =
            open.indices.minBy(i => segOrd(minSegOf(open(i))))
          val first = open(ringMinIdx)
          val ms = minSegOf(first)
          val probe = Pt((ms._1.x + ms._2.x) / 2, (ms._1.y + ms._2.y) / 2)
          val innersOfClosed =
            closed.count(pts => pointInRing(probe, Ring(pts)))
          val ringMinIsOuter = innersOfClosed % 2 == 0
          // DFS over arcs connecting first.last back to first.head;
          // bounded like the reference (max_depth, loop set on visited
          // locations)
          val target = first.head
          val maxDepth = 20
          val cands = mutable.ArrayBuffer.empty[Vector[Pt]]
          def dfs(pts: Vector[Pt], lastArc: Int,
              locDone: List[Pt], depth: Int): Unit = {
            if (depth > maxDepth || cands.size > 64) return
            val stop = pts.last
            open.indices.foreach { j =>
              if (j != ringMinIdx && j != lastArc) {
                val arc = open(j)
                val ext =
                  if (arc.head == stop) Some(arc)
                  else if (arc.last == stop) Some(arc.reverse)
                  else None
                ext.foreach { e =>
                  val joined = pts ++ e.tail
                  if (e.last == target) cands += joined
                  else if (!locDone.contains(e.last))
                    dfs(joined, j, e.last :: locDone, depth + 1)
                }
              }
            }
          }
          dfs(first, ringMinIdx, List(first.last), 0)
          if (cands.isEmpty) return None
          val chosen =
            if (ringMinIsOuter) cands.minBy(p => math.abs(walkArea2x(p)))
            else cands.maxBy(p => math.abs(walkArea2x(p)))
          // remove every arc the chosen walk consumed: its segments
          val chosenSegs = chosen.zip(chosen.tail).map(normSeg).toSet
          val keep = open.filterNot(a =>
            a.zip(a.tail).map(normSeg).forall(chosenSegs.contains))
          open.clear(); open ++= keep
          closed += chosen
      }
    }

    val rings = closed.map { pts =>
      if (pts.size < 4) return None
      val r = Ring(pts)
      if (r.signedArea2x == 0.0) return None
      r
    }
    Some(rings.toVector)
  }

  /** relation member ways → (MULTI)POLYGON: ring assembly from way
    * segments, outer/inner classification by containment nesting
    * (src/geom-from-osm.cpp:219-252; libosmium area assembler
    * semantics: old-style multipolygons with role-less members work,
    * unclosed leftovers make the whole assembly invalid → null). */
  def createMultiPolygon(ways: Seq[Seq[Pt]],
      srid: Int = Srid.WGS84): Geometry = {
    val chains0 = ways.map(dedupConsecutive).filter(_.size >= 2)
    if (chains0.isEmpty) return NullGeom(srid)
    // duplicate members/edges cancel in pairs BEFORE ring assembly
    // (e.g. a relation listing the same outer way twice reduces to
    // the remaining members' segments)
    val allSegs = chains0.flatMap(unitSegments)
    val segsIn: Seq[(Pt, Pt)] =
      if (!hasDuplicateSegments(allSegs)) allSegs
      else cancelDuplicatePairs(allSegs)
    if (segsIn.isEmpty) return NullGeom(srid)
    val rings = assembleRings(segsIn) match {
      case Some(rs) if rs.nonEmpty => rs
      case _ => return NullGeom(srid)
    }

    // 2. classify nesting by containment depth of a representative vertex
    val ringSeq = rings.toVector
    def containedIn(inner: Ring, outer: Ring): Boolean =
      pointInRing(midpointProbe(inner), outer)
    val depth = ringSeq.map(r =>
      ringSeq.count(o => (o ne r) && containedIn(r, o)))
    val polys = mutable.ArrayBuffer.empty[Polygon]
    ringSeq.indices.foreach { i =>
      if (depth(i) % 2 == 0) {
        val inners = ringSeq.indices.filter { j =>
          depth(j) == depth(i) + 1 && containedIn(ringSeq(j), ringSeq(i))
        }.map(j => cw(ringSeq(j))).toVector
        polys += Polygon(ccw(ringSeq(i)), inners, srid)
      }
    }
    polys.toVector match {
      case Vector()  => NullGeom(srid)
      case Vector(p) => p
      case ps        => MultiPolygon(ps, srid)
    }
  }

  /** member nodes+ways → GEOMETRYCOLLECTION
    * (src/geom-from-osm.cpp:254-283). */
  def createCollection(pts: Seq[Pt], ways: Seq[Seq[Pt]],
      srid: Int = Srid.WGS84): Geometry = {
    val items: Vector[Geometry] =
      pts.map(p => Point(p, srid): Geometry).toVector ++
        ways.map(createLineString(_, srid)).filterNot(_.isNull)
    if (items.isEmpty) NullGeom(srid) else GeometryCollection(items, srid)
  }

  /** Envelope (src/output-flex.cpp:402-451). */
  def getBbox(g: Geometry): Option[Box] = Box.of(g)

  // ---- helpers ----

  private def ccw(r: Ring): Ring = if (r.signedArea2x >= 0) r else r.reverse
  private def cw(r: Ring): Ring = if (r.signedArea2x <= 0) r else r.reverse

  /** A probe point for nesting tests: the midpoint of the ring's first
    * edge. Edge interiors are never shared between assembled rings
    * (duplicate segments cancel in pairs), so unlike a vertex — which
    * may be a touch point lying ON another ring's boundary — this point
    * classifies containment correctly for point-touching rings. */
  private def midpointProbe(r: Ring): Pt = {
    val a = r.pts(0); val b = r.pts(1)
    Pt((a.x + b.x) / 2, (a.y + b.y) / 2)
  }

  /** Ray-cast point-in-ring (boundary points may go either way — fine
    * for nesting classification of non-touching rings). */
  def pointInRing(p: Pt, r: Ring): Boolean = {
    var inside = false
    val ps = r.pts
    var i = 0
    while (i < ps.size - 1) {
      val a = ps(i); val b = ps(i + 1)
      if ((a.y > p.y) != (b.y > p.y) &&
        p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x) inside = !inside
      i += 1
    }
    inside
  }

  /** O(n²) proper self-intersection test over non-adjacent segments —
    * OSM ways are short (≤2000 nodes), so this is fine per-row; the
    * area assembler in the reference does the equivalent sweep. */
  def selfIntersects(r: Ring): Boolean = {
    val ps = r.pts
    val n = ps.size - 1
    def segsIntersect(p1: Pt, p2: Pt, p3: Pt, p4: Pt): Boolean = {
      def orient(a: Pt, b: Pt, c: Pt): Double =
        (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
      val d1 = orient(p3, p4, p1); val d2 = orient(p3, p4, p2)
      val d3 = orient(p1, p2, p3); val d4 = orient(p1, p2, p4)
      ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
    }
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        val adjacent = (i == 0 && j == n - 1)
        if (!adjacent &&
          segsIntersect(ps(i), ps(i + 1), ps(j), ps(j + 1))) return true
        j += 1
      }
      i += 1
    }
    false
  }
}
