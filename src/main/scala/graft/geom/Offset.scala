package graft.geom

/** Polygon offsetting (ST_Buffer for polygons, positive and negative
  * distances) built on [[PolyUnion]]'s overlay engine:
  *
  *  - `buffer(P, +d)` = P ∪ (∪ edge boxes) ∪ (∪ vertex disks): each
  *    boundary edge contributes the rectangle of points within `d` of
  *    it, each vertex a regular `circleSegs`-gon disk (PostGIS round
  *    joins with quad_segs≈circleSegs/4);
  *  - `buffer(P, -d)` = P \ (same boundary shapes): the interior
  *    points at distance > d from the boundary (erosion as difference
  *    with the boundary's dilation).
  *
  * The reference pushes ST_Buffer to PostGIS
  * (src/gen/gen-tile-vector.cpp:41-60); this native form runs inside
  * executors. Disk discretization makes buffered areas approximate
  * (inscribed-polygon under-estimate, < 1% at 16 segments); the
  * dissolve pipeline only uses buffers as a morphological close, where
  * that error is far below the buffer margin itself.
  */
object Offset {

  private def ringSegments(r: Ring): Seq[(Pt, Pt)] = {
    val pts = if (r.pts.head == r.pts.last) r.pts else r.pts :+ r.pts.head
    pts.iterator.zip(pts.iterator.drop(1)).filter(p => p._1 != p._2).toSeq
  }

  private def edgeBox(a: Pt, b: Pt, d: Double): Polygon = {
    val len = math.hypot(b.x - a.x, b.y - a.y)
    val nx = -(b.y - a.y) / len * d; val ny = (b.x - a.x) / len * d
    Polygon(Ring(Vector(
      Pt(a.x + nx, a.y + ny), Pt(b.x + nx, b.y + ny),
      Pt(b.x - nx, b.y - ny), Pt(a.x - nx, a.y - ny),
      Pt(a.x + nx, a.y + ny))))
  }

  private def disk(c: Pt, d: Double, segs: Int): Polygon = {
    val pts = (0 until segs).map { i =>
      val t = 2 * math.Pi * i / segs
      Pt(c.x + d * math.cos(t), c.y + d * math.sin(t))
    }.toVector
    Polygon(Ring(pts :+ pts.head))
  }

  /** boundary dilation shapes of all rings of `polys` */
  private def boundaryShapes(polys: Seq[Polygon], d: Double,
      circleSegs: Int): Seq[Polygon] =
    polys.flatMap { p =>
      (p.outer +: p.inners).flatMap { r =>
        val segs = ringSegments(r)
        segs.map { case (a, b) => edgeBox(a, b, d) } ++
          segs.map(_._1).distinct.map(disk(_, d, circleSegs))
      }
    }

  private def polysOf(g: Geometry): Seq[Polygon] = g match {
    case p: Polygon          => Seq(p)
    case MultiPolygon(ps, _) => ps
    case _                   => Seq.empty
  }

  /** Offset every polygon of `g` by `d` (positive grows, negative
    * shrinks; 0 returns the input). Result may merge, split, or
    * vanish. */
  def buffer(g: Geometry, d: Double, circleSegs: Int = 16): Geometry = {
    val polys = polysOf(g)
    if (polys.isEmpty || d == 0.0) return g
    val dist = math.abs(d)
    val shapes = boundaryShapes(polys, dist, circleSegs)
    val res =
      if (d > 0) PolyUnion.union(polys ++ shapes)
      else PolyUnion.difference(polys, shapes)
    res match {
      case n: NullGeom => n.copy(srid = g.srid)
      case p: Polygon  => p.copy(srid = g.srid)
      case m: MultiPolygon => m.copy(srid = g.srid)
      case other => other
    }
  }
}
