package graft.geom

/** The reference's debug geometry rendering (src/geom-output.hpp):
  * WKT-shaped, with doubles in C++ default-ostream format (six
  * significant digits, trailing zeros stripped) and the null geometry
  * printed as `NULL(NULL)`.
  */
object Wkt {

  /** C++ `operator<<(double)` with default precision — %g-style six
    * significant digits. The ported test vectors stay in the plain
    * (non-exponent) range. */
  private def num(v: Double): String = {
    if (v == math.rint(v) && math.abs(v) < 1e15) return v.toLong.toString
    val s = new java.math.BigDecimal(v)
      .round(new java.math.MathContext(6)).toString
    if (s.contains('E')) f"$v%.6g" // not exercised by the ported vectors
    else if (s.contains('.')) s.replaceAll("0+$", "").stripSuffix(".")
    else s
  }

  private def pt(p: Pt): String = s"${num(p.x)} ${num(p.y)}"
  private def pts(ps: Seq[Pt]): String = ps.map(pt).mkString(",")
  private def rings(outer: Ring, inners: Seq[Ring]): String =
    (outer +: inners).map(r => "(" + pts(r.pts) + ")").mkString(",")

  /** The inner (typeless) rendering: what `ss << point_t{...}` etc.
    * produce in the reference. */
  def inner(g: Geometry): String = g match {
    case _: NullGeom       => "NULL"
    case Point(p, _)       => pt(p)
    case LineString(ps, _) => pts(ps)
    case Polygon(o, is, _) => rings(o, is)
    case MultiPoint(ps, _) =>
      ps.map(p => "(" + pt(p.pt) + ")").mkString(",")
    case MultiLineString(ls, _) =>
      ls.map(l => "(" + pts(l.pts) + ")").mkString(",")
    case MultiPolygon(polys, _) =>
      polys.map(p => "(" + rings(p.outer, p.inners) + ")").mkString(",")
    case GeometryCollection(gs, _) => gs.map(write).mkString(",")
  }

  /** The full rendering: `TYPE(inner)`, null printed `NULL(NULL)`. */
  def write(g: Geometry): String = g.typeName + "(" + inner(g) + ")"
}
