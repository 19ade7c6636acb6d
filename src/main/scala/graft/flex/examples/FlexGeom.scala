package graft.flex.examples

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.geom._

/** Shared geometry constructors for typed flex configs — the Column
  * forms of the Lua `object:as_*()` calls (src/output-flex.cpp:
  * 1442-1450) over the coordinate arrays the CLI enriches entity
  * frames with (`__lons`/`__lats` on ways, `__mlons`/`__mlats` on
  * relations). All produce EWKB in the requested projection; invalid
  * geometry → NULL (the flex soft-error path: a not_null geom column
  * then drops the row).
  */
object FlexGeom {

  private def toPts(lons: Seq[Double], lats: Seq[Double]): Seq[Pt] =
    lons.zip(lats).map { case (x, y) => Pt(x, y) }

  private def enc(g: Geometry, srid: Int): Array[Byte] = g match {
    case _: NullGeom => null
    case g2 => Ewkb.encode(
      if (srid == g2.srid) g2 else GeomOps.transform(g2, srid))
  }

  /** object:as_point() reprojected (node lon/lat). */
  def asPoint(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((lon: Double, lat: Double) =>
      enc(FromOsm.createPoint(lon, lat), srid))

  /** object:as_polygon() for a closed way. */
  def asPolygon(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else enc(FromOsm.createPolygon(toPts(lons, lats)), srid))

  /** object:as_linestring(). */
  def asLinestring(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else enc(FromOsm.createLineString(toPts(lons, lats)), srid))

  /** object:as_multipolygon() over resolved member-way coords. */
  def asMultiPolygon(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null
      else enc(FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }), srid))

  /** object:as_multipolygon() split into single polygons with their
    * planar area in the output projection — the classic `for sgeom in
    * geom:geometries()` + way_area loop (compatible.lua:758-764). */
  def polygonPieces(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) Seq.empty[(Array[Byte], Double)]
      else FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }) match {
        case _: NullGeom => Seq.empty[(Array[Byte], Double)]
        case g => GeomOps.splitMulti(g).map { p =>
          val proj = GeomOps.transform(p, srid)
          (Ewkb.encode(proj), GeomOps.area(proj))
        }
      })

  /** object:as_multilinestring(), optionally :line_merge()d. */
  def asMultiLinestring(srid: Int = Srid.WebMercator,
      merge: Boolean = false): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null
      else FromOsm.createMultiLineString(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) },
        forceMulti = true) match {
        case _: NullGeom => null
        case g => enc(if (merge) GeomOps.lineMerge(g) else g, srid)
      })

  /** geom:segmentize(max) split into pieces — the classic add_line
    * loop (compatible.lua:564-572): linestring → segmentize →
    * one row per split piece, already projected. */
  def linePieces(srid: Int = Srid.WebMercator,
      maxLength: Double = 100000.0): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) Seq.empty[Array[Byte]]
      else FromOsm.createLineString(toPts(lons, lats)) match {
        case _: NullGeom => Seq.empty[Array[Byte]]
        case g => GeomOps.splitMulti(GeomOps.segmentize(
          GeomOps.transform(g, srid), maxLength)).map(Ewkb.encode(_))
      })

  /** relation multilinestring → segmentize → split pieces (the
    * compatible.lua relation add_line path — NO line_merge there,
    * unlike the classic C transform). */
  def relLinePieces(srid: Int = Srid.WebMercator,
      maxLength: Double = 100000.0, merge: Boolean = false)
      : UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) Seq.empty[Array[Byte]]
      else FromOsm.createMultiLineString(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) },
        forceMulti = true) match {
        case _: NullGeom => Seq.empty[Array[Byte]]
        case g0 =>
          val g = if (merge) GeomOps.lineMerge(g0) else g0
          GeomOps.splitMulti(GeomOps.segmentize(
            GeomOps.transform(g, srid), maxLength)).map(Ewkb.encode(_))
      })

  /** geom:pole_of_inaccessibility() over an assembled multipolygon,
    * in the output projection (forests.lua labelpoint). */
  def poleOfInaccessibility(srid: Int = Srid.WebMercator)
      : UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null
      else FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }) match {
        case _: NullGeom => null
        case g => GeomOps.poleOfInaccessibility(
          GeomOps.transform(g, srid), 0.0) match {
          case _: NullGeom => null
          case p => Ewkb.encode(p)
        }
      })

  /** geom:area() in the output projection (forests.lua). */
  def mpArea(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null.asInstanceOf[java.lang.Double]
      else FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }) match {
        case _: NullGeom => null.asInstanceOf[java.lang.Double]
        case g => java.lang.Double.valueOf(
          GeomOps.area(GeomOps.transform(g, srid)))
      })

  def wayPolygonArea(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null.asInstanceOf[java.lang.Double]
      else FromOsm.createPolygon(toPts(lons, lats)) match {
        case _: NullGeom => null.asInstanceOf[java.lang.Double]
        case g => java.lang.Double.valueOf(
          GeomOps.area(GeomOps.transform(g, srid)))
      })

  /** geom:spherical_area() — on the 4326 geometry (geometries.lua). */
  def wayPolygonSphericalArea(): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null.asInstanceOf[java.lang.Double]
      else FromOsm.createPolygon(toPts(lons, lats)) match {
        case _: NullGeom => null.asInstanceOf[java.lang.Double]
        case g => java.lang.Double.valueOf(GeomOps.sphericalArea(g))
      })

  def mpSphericalArea(): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null.asInstanceOf[java.lang.Double]
      else FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }) match {
        case _: NullGeom => null.asInstanceOf[java.lang.Double]
        case g => java.lang.Double.valueOf(GeomOps.sphericalArea(g))
      })

  /** as_polygon():centroid() in the output projection
    * (addresses.lua). */
  def wayPolygonCentroid(srid: Int = Srid.WGS84): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else FromOsm.createPolygon(toPts(lons, lats)) match {
        case _: NullGeom => null
        case g => GeomOps.centroid(GeomOps.transform(g, srid)) match {
          case _: NullGeom => null
          case c           => Ewkb.encode(c)
        }
      })

  def mpCentroid(srid: Int = Srid.WGS84): UserDefinedFunction =
    udf((mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) =>
      if (mlons == null) null
      else FromOsm.createMultiPolygon(
        mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }) match {
        case _: NullGeom => null
        case g => GeomOps.centroid(GeomOps.transform(g, srid)) match {
          case _: NullGeom => null
          case c           => Ewkb.encode(c)
        }
      })

  /** hstore.lua's way fallback: as_polygon(), or as_linestring() when
    * the polygon is invalid/unclosed. */
  def asPolygonOrLine(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else FromOsm.createPolygon(toPts(lons, lats)) match {
        case _: NullGeom =>
          enc(FromOsm.createLineString(toPts(lons, lats)), srid)
        case g => enc(g, srid)
      })

  /** object:as_geometrycollection() — member nodes as points, member
    * ways as linestrings (unitable.lua; src/geom-from-osm.cpp:
    * 254-283). */
  def asCollection(srid: Int = Srid.WebMercator): UserDefinedFunction =
    udf((nlons: Seq[Double], nlats: Seq[Double],
        mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) => {
      val pts = if (nlons == null) Seq.empty[Pt]
        else toPts(nlons, nlats)
      val ways = if (mlons == null) Seq.empty[Seq[Pt]]
        else mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }
      enc(FromOsm.createCollection(pts, ways), srid)
    })

  /** pole_of_inaccessibility({stretch = s}) over a single way polygon:
    * x-coordinates scaled by `s` before the search and the result
    * scaled back (src/flex-lua-geom.cpp:236-255 /
    * geom-pole-of-inaccessibility.cpp stretch handling). */
  def wayPoleOfInaccessibility(srid: Int = Srid.WebMercator,
      stretch: Double = 1.0): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else FromOsm.createPolygon(toPts(lons, lats)) match {
        case _: NullGeom => null
        case g => poleStretch(GeomOps.transform(g, srid), stretch)
      })

  /** Pole with stretch over one polygon piece (labelpoint.lua splits
    * multipolygons and computes the pole per piece). */
  def piecePoleOfInaccessibility(stretch: Double = 1.0)
      : UserDefinedFunction =
    udf((ewkb: Array[Byte]) =>
      if (ewkb == null) null
      else poleStretch(Ewkb.decode(ewkb), stretch))

  def pieceCentroid(): UserDefinedFunction =
    udf((ewkb: Array[Byte]) =>
      if (ewkb == null) null
      else GeomOps.centroid(Ewkb.decode(ewkb)) match {
        case _: NullGeom => null
        case c           => Ewkb.encode(c)
      })

  /** as_geometrycollection():centroid() — the filtered max-dimension
    * centroid (public-transport.lua stop areas). */
  def collectionCentroid(srid: Int = Srid.WebMercator)
      : UserDefinedFunction =
    udf((nlons: Seq[Double], nlats: Seq[Double],
        mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) => {
      val pts = if (nlons == null) Seq.empty[Pt] else toPts(nlons, nlats)
      val ways = if (mlons == null) Seq.empty[Seq[Pt]]
        else mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }
      FromOsm.createCollection(pts, ways) match {
        case _: NullGeom => null
        case g => GeomOps.centroid(GeomOps.transform(g, srid)) match {
          case _: NullGeom => null
          case c           => Ewkb.encode(c)
        }
      }
    })

  /** The stop-area "radius": the 3857 bbox diagonal of the member
    * collection (public-transport.lua:176-178). */
  def collectionBboxDiagonal(srid: Int = Srid.WebMercator)
      : UserDefinedFunction =
    udf((nlons: Seq[Double], nlats: Seq[Double],
        mlons: Seq[Seq[Double]], mlats: Seq[Seq[Double]]) => {
      val pts = if (nlons == null) Seq.empty[Pt] else toPts(nlons, nlats)
      val ways = if (mlons == null) Seq.empty[Seq[Pt]]
        else mlons.zip(mlats).map { case (lo, la) => toPts(lo, la) }
      FromOsm.createCollection(pts, ways) match {
        case _: NullGeom => null.asInstanceOf[java.lang.Double]
        case g => Box.of(GeomOps.transform(g, srid)) match {
          case Some(b) => java.lang.Double.valueOf(math.sqrt(
            (b.maxX - b.minX) * (b.maxX - b.minX) +
              (b.maxY - b.minY) * (b.maxY - b.minY)))
          case None => null.asInstanceOf[java.lang.Double]
        }
      }
    })

  private def poleStretch(g: Geometry, stretch: Double): Array[Byte] =
    GeomOps.poleOfInaccessibility(g, 0.0, stretch) match {
      case p: Point => Ewkb.encode(p)
      case _        => null
    }
}
