package graft.functions

import org.apache.spark.sql.SparkSession

import graft.geom._

/** DataFrame/SQL surface for the geometry library: functions over
  * EWKB-binary columns, registered into the session function registry
  * so they work from both the Column API and `spark.sql`
  * (the Spark analog of the reference's Lua geometry methods,
  * src/flex-lua-geom.cpp:345-370).
  *
  * These are Scala UDFs (serialization boundary per call). That is the
  * right first rung for the complex assembly ops; the per-row scalar
  * hot-path ops (area/length/bbox over coordinate arrays) also exist as
  * pure Column expressions in [[GeomColumnFunctions]], which stay in
  * WholeStageCodegen. Promote further ops to native Catalyst
  * Expressions only when profiles show the UDF boundary matters.
  */
object GeomUdfs {

  private def dec(b: Array[Byte]): Geometry = Ewkb.decode(b)
  private def enc(g: Geometry): Array[Byte] = g match {
    case _: NullGeom => null
    case g           => Ewkb.encode(g)
  }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("st_point",
      (lon: Double, lat: Double) => enc(FromOsm.createPoint(lon, lat)))
    u.register("st_make_line", (xs: Seq[Double], ys: Seq[Double]) =>
      enc(FromOsm.createLineString(xs.zip(ys).map { case (x, y) => Pt(x, y) })))
    u.register("st_make_polygon", (xs: Seq[Double], ys: Seq[Double]) =>
      enc(FromOsm.createPolygon(xs.zip(ys).map { case (x, y) => Pt(x, y) })))
    u.register("st_geometry_type", (b: Array[Byte]) => dec(b).typeName)
    u.register("st_num_geometries", (b: Array[Byte]) => dec(b).numGeometries)
    u.register("st_srid", (b: Array[Byte]) => dec(b).srid)
    u.register("st_dimension", (b: Array[Byte]) => dec(b).dimension)
    u.register("st_area", (b: Array[Byte]) => GeomOps.area(dec(b)))
    u.register("st_spherical_area",
      (b: Array[Byte]) => GeomOps.sphericalArea(dec(b)))
    u.register("st_length", (b: Array[Byte]) => GeomOps.length(dec(b)))
    u.register("st_spherical_length",
      (b: Array[Byte]) => GeomOps.sphericalLength(dec(b)))
    u.register("st_transform",
      (b: Array[Byte], srid: Int) => enc(GeomOps.transform(dec(b), srid)))
    u.register("st_centroid", (b: Array[Byte]) => enc(GeomOps.centroid(dec(b))))
    u.register("st_reverse", (b: Array[Byte]) => enc(GeomOps.reverse(dec(b))))
    u.register("st_simplify",
      (b: Array[Byte], tol: Double) => enc(GeomOps.simplify(dec(b), tol)))
    u.register("st_segmentize",
      (b: Array[Byte], maxLen: Double) => enc(GeomOps.segmentize(dec(b), maxLen)))
    u.register("st_geodesic_segmentize", // densify along WGS84 geodesics
      (b: Array[Byte], maxLen: Double) =>
        enc(GeomOps.geodesicSegmentize(dec(b), maxLen)))
    u.register("st_line_merge", (b: Array[Byte]) => enc(GeomOps.lineMerge(dec(b))))
    u.register("st_split_multi", // generator-shaped: explode() the result
      (b: Array[Byte]) => GeomOps.splitMulti(dec(b)).map(enc))
    u.register("st_geometry_n",
      (b: Array[Byte], n: Int) => enc(GeomOps.geometryN(dec(b), n)))
    u.register("st_pole_of_inaccessibility",
      (b: Array[Byte], prec: Double) =>
        enc(GeomOps.poleOfInaccessibility(dec(b), prec)))
    u.register("st_envelope", (b: Array[Byte]) =>
      FromOsm.getBbox(dec(b)).map(x => Seq(x.minX, x.minY, x.maxX, x.maxY)).orNull)
    u.register("st_x", (b: Array[Byte]) => dec(b) match {
      case p: Point => p.x
      case _        => Double.NaN
    })
    u.register("st_y", (b: Array[Byte]) => dec(b) match {
      case p: Point => p.y
      case _        => Double.NaN
    })
  }
}
