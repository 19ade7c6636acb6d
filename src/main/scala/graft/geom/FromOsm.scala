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

  /** Segments surviving pair-erasure, as 2-point ways for the ring
    * chain walk (insertion order preserved). */
  private def cancelDuplicatePairs(segs: Seq[(Pt, Pt)]): Seq[Seq[Pt]] = {
    val counts = mutable.LinkedHashMap.empty[(Pt, Pt), Int]
    segs.foreach { s =>
      val k = normSeg(s)
      counts.update(k, counts.getOrElse(k, 0) + 1)
    }
    counts.iterator.collect {
      case ((a, b), n) if n % 2 == 1 => Seq(a, b)
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
      else chainRings(cancelDuplicatePairs(segs)) match {
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

  /** relation member ways → (MULTI)POLYGON: ring assembly from way
    * segments, outer/inner classification by containment nesting
    * (src/geom-from-osm.cpp:219-252; libosmium area assembler
    * semantics: old-style multipolygons with role-less members work,
    * unclosed leftovers make the whole assembly invalid → null). */
  /** Chain open point sequences into closed rings by exact endpoint
    * matching. None when a leftover chain can't close or a ring
    * degenerates to zero area (unclosed leftovers invalidate the
    * whole assembly, like the reference's create_rings). */
  private def chainRings(segs: Seq[Seq[Pt]]): Option[Vector[Ring]] = {
    val used = Array.fill(segs.size)(false)
    val rings = mutable.ArrayBuffer.empty[Ring]
    segs.indices.foreach { i =>
      if (!used(i)) {
        used(i) = true
        val acc = mutable.ArrayBuffer.from(segs(i))
        var progress = true
        while (acc.head != acc.last && progress) {
          progress = false
          var j = 0
          while (j < segs.size && !progress) {
            if (!used(j)) {
              val s = segs(j)
              if (s.head == acc.last) {
                acc ++= s.tail; used(j) = true; progress = true
              } else if (s.last == acc.last) {
                acc ++= s.reverse.tail; used(j) = true; progress = true
              }
            }
            j += 1
          }
        }
        if (acc.head == acc.last && acc.size >= 4) {
          val r = Ring(acc.toVector)
          // degenerate (zero-area / collinear) rings invalidate the
          // assembly like unclosed ones (relation-changes.feature:
          // a node move collapsing the ring removes the row)
          if (r.signedArea2x == 0.0) return None
          rings += r
        } else return None // unclosed leftover → invalid assembly
      }
    }
    Some(rings.toVector)
  }

  def createMultiPolygon(ways: Seq[Seq[Pt]],
      srid: Int = Srid.WGS84): Geometry = {
    val chains0 = ways.map(dedupConsecutive).filter(_.size >= 2)
    if (chains0.isEmpty) return NullGeom(srid)
    // duplicate members/edges cancel in pairs BEFORE ring assembly
    // (e.g. a relation listing the same outer way twice reduces to
    // the remaining members' segments)
    val allSegs = chains0.flatMap(unitSegments)
    val chains: Seq[Seq[Pt]] =
      if (!hasDuplicateSegments(allSegs)) chains0
      else cancelDuplicatePairs(allSegs)
    if (chains.isEmpty) return NullGeom(srid)
    val rings = chainRings(chains) match {
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

  /** A point guaranteed inside the ring: midpoint of a diagonal fan
    * vertex probe — uses the first vertex (sufficient for nesting tests
    * on non-crossing OSM rings, where any vertex of the inner ring lies
    * inside the outer). */
  private def midpointProbe(r: Ring): Pt = r.pts.head

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
