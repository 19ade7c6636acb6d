package graft.geom

/** Geometry value model — a Scala ADT mirroring the reference's tagged
  * union `geom::geometry_t` (reference: src/geom.hpp:303-439): variant
  * of null | point | linestring | polygon | multipoint |
  * multilinestring | multipolygon | collection, carrying an SRID
  * (default 4326, src/geom.hpp:437).
  *
  * Coordinates are double x/y (src/geom.hpp:62-122). Polygons are one
  * outer ring plus inner rings; rings are closed (first == last point).
  */
final case class Pt(x: Double, y: Double) {
  def distanceTo(o: Pt): Double = {
    val dx = x - o.x; val dy = y - o.y
    math.sqrt(dx * dx + dy * dy)
  }
}

object Srid {
  /** PROJ_LATLONG (src/projection.hpp:13) */
  val WGS84 = 4326
  /** PROJ_SPHERE_MERC (src/projection.hpp:14) */
  val WebMercator = 3857
}

sealed trait Geometry {
  def srid: Int
  def withSrid(s: Int): Geometry

  /** WKT-style type name (src/geom-functions.cpp:40-58). */
  def typeName: String = this match {
    case _: NullGeom           => "NULL"
    case _: Point              => "POINT"
    case _: LineString         => "LINESTRING"
    case _: Polygon            => "POLYGON"
    case _: MultiPoint         => "MULTIPOINT"
    case _: MultiLineString    => "MULTILINESTRING"
    case _: MultiPolygon       => "MULTIPOLYGON"
    case _: GeometryCollection => "GEOMETRYCOLLECTION"
  }

  /** 0/1/2, max over collections (src/geom.hpp:441-460). */
  def dimension: Int = this match {
    case _: NullGeom                => 0
    case _: Point | _: MultiPoint   => 0
    case _: LineString              => 1
    case _: MultiLineString         => 1
    case _: Polygon | _: MultiPolygon => 2
    case GeometryCollection(gs, _)  =>
      if (gs.isEmpty) 0 else gs.map(_.dimension).max
  }

  /** Member count (src/geom-functions.cpp:60-66). */
  def numGeometries: Int = this match {
    case _: NullGeom                 => 0
    case MultiPoint(ps, _)           => ps.size
    case MultiLineString(ls, _)      => ls.size
    case MultiPolygon(ps, _)         => ps.size
    case GeometryCollection(gs, _)   => gs.size
    case _                           => 1
  }

  def isNull: Boolean = isInstanceOf[NullGeom]
}

final case class NullGeom(srid: Int = Srid.WGS84) extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class Point(pt: Pt, srid: Int = Srid.WGS84) extends Geometry {
  def x: Double = pt.x
  def y: Double = pt.y
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class LineString(pts: Vector[Pt], srid: Int = Srid.WGS84)
    extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

/** A closed ring: first point equals last point. */
final case class Ring(pts: Vector[Pt]) {
  def isClosed: Boolean = pts.size >= 4 && pts.head == pts.last
  /** Signed shoelace area ×2 (positive = counter-clockwise). Computed
    * relative to the first vertex: raw cross terms at projected
    * coordinate magnitudes cancel catastrophically for small rings. */
  def signedArea2x: Double = {
    if (pts.isEmpty) return 0.0
    val o = pts.head
    pts.iterator.zip(pts.iterator.drop(1)).map { case (a, b) =>
      (a.x - o.x) * (b.y - o.y) - (b.x - o.x) * (a.y - o.y)
    }.sum
  }
  def reverse: Ring = Ring(pts.reverse)
}

final case class Polygon(outer: Ring, inners: Vector[Ring] = Vector.empty,
    srid: Int = Srid.WGS84) extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class MultiPoint(pts: Vector[Point], srid: Int = Srid.WGS84)
    extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class MultiLineString(lines: Vector[LineString],
    srid: Int = Srid.WGS84) extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class MultiPolygon(polys: Vector[Polygon], srid: Int = Srid.WGS84)
    extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

final case class GeometryCollection(geoms: Vector[Geometry],
    srid: Int = Srid.WGS84) extends Geometry {
  def withSrid(s: Int): Geometry = copy(srid = s)
}

/** Axis-aligned bounding box (src/geom-box.cpp). */
final case class Box(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def extend(p: Pt): Box =
    Box(math.min(minX, p.x), math.min(minY, p.y),
      math.max(maxX, p.x), math.max(maxY, p.y))
  def extend(o: Box): Box =
    Box(math.min(minX, o.minX), math.min(minY, o.minY),
      math.max(maxX, o.maxX), math.max(maxY, o.maxY))
  def contains(p: Pt): Boolean =
    p.x >= minX && p.x <= maxX && p.y >= minY && p.y <= maxY
  def intersects(o: Box): Boolean =
    !(o.minX > maxX || o.maxX < minX || o.minY > maxY || o.maxY < minY)
}

object Box {
  val empty: Box = Box(Double.MaxValue, Double.MaxValue,
    -Double.MaxValue, -Double.MaxValue)

  def of(g: Geometry): Option[Box] = {
    def pts(g: Geometry): Iterator[Pt] = g match {
      case _: NullGeom            => Iterator.empty
      case Point(p, _)            => Iterator.single(p)
      case LineString(ps, _)      => ps.iterator
      case Polygon(o, is, _)      => o.pts.iterator ++ is.iterator.flatMap(_.pts)
      case MultiPoint(ps, _)      => ps.iterator.map(_.pt)
      case MultiLineString(ls, _) => ls.iterator.flatMap(_.pts)
      case MultiPolygon(ps, _)    =>
        ps.iterator.flatMap(p => p.outer.pts.iterator ++ p.inners.flatMap(_.pts))
      case GeometryCollection(gs, _) => gs.iterator.flatMap(pts)
    }
    val it = pts(g)
    if (!it.hasNext) None
    else Some(it.foldLeft(Box.empty)(_ extend _))
  }
}
