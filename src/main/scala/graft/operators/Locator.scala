package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom._

/** Spatial classifier (reference: src/locator.hpp:46-153,
  * src/locator.cpp; Lua API src/flex-lua-locator.cpp:73-80): a named
  * set of regions (bboxes or polygons), answering
  * `all_intersecting(geom)` / `first_intersecting(geom)`.
  *
  * The reference builds a per-process R-tree; here the region set is
  * broadcast (region lists are small — countries, zones) and the test
  * is a bbox prefilter + exact point-in-polygon, i.e. a broadcast
  * spatial join that scales with the big side only.
  */
final case class Region(name: String, geom: Geometry, box: Box)

class Locator private (regions: Vector[Region]) extends Serializable {

  def containingPoint(x: Double, y: Double): Seq[String] = {
    val p = Pt(x, y)
    regions.withFilter(_.box.contains(p)).withFilter(r => geomContains(r.geom, p))
      .map(_.name)
  }

  private def geomContains(g: Geometry, p: Pt): Boolean = g match {
    // bbox-only region (add_bbox): the box prefilter IS the exact test
    case _: NullGeom => true
    case Polygon(outer, inners, _) =>
      FromOsm.pointInRing(p, outer) && !inners.exists(FromOsm.pointInRing(p, _))
    case MultiPolygon(ps, _) => ps.exists(geomContains(_, p))
    case _                   => Box.of(g).exists(_.contains(p))
  }

  /** Region names intersecting a full geometry — the Lua API's
    * all_intersecting(geom) (src/locator.cpp:120-150 visits the
    * R-tree with real intersection tests). Test here: bbox
    * prefilter, then any geometry vertex inside the region or any
    * region vertex inside the geometry (exact for the
    * classification workloads the shipped configs run — tiny
    * features against large regions — and for bbox regions whose
    * box-overlap is the reference test for points/bboxes). */
  def intersectingGeom(g: Geometry): Seq[String] = {
    def vertices(x: Geometry): Seq[Pt] = x match {
      case _: NullGeom            => Nil
      case Point(p, _)            => Seq(p)
      case LineString(ps, _)      => ps
      case Polygon(o, is, _)      => o.pts ++ is.flatMap(_.pts)
      case MultiPoint(ps, _)      => ps.map(_.pt)
      case MultiLineString(ls, _) => ls.flatMap(_.pts)
      case MultiPolygon(ps, _)    => ps.flatMap(vertices)
      case GeometryCollection(gs, _) => gs.flatMap(vertices)
    }
    Box.of(g) match {
      case None => Nil
      case Some(gb) =>
        val pts = vertices(g)
        regions.withFilter(_.box.intersects(gb)).withFilter { r =>
          r.geom match {
            case _: NullGeom => true // bbox region: overlap decides
            case rg => pts.exists(p => geomContains(rg, p)) ||
              vertices(rg).exists(p => polyContains(g, p))
          }
        }.map(_.name)
    }
  }

  private def polyContains(g: Geometry, p: Pt): Boolean = g match {
    case Polygon(outer, inners, _) =>
      FromOsm.pointInRing(p, outer) && !inners.exists(FromOsm.pointInRing(p, _))
    case MultiPolygon(ps, _) => ps.exists(polyContains(_, p))
    case _                   => false
  }

  /** all_intersecting: every region containing the point. */
  def registerAll(spark: SparkSession, fnName: String): Unit = {
    val bc = spark.sparkContext.broadcast(this)
    spark.udf.register(fnName,
      (x: Double, y: Double) => bc.value.containingPoint(x, y))
  }

  /** first_intersecting: first region in insertion order, like the
    * reference's locator (src/locator.cpp). */
  def registerFirst(spark: SparkSession, fnName: String): Unit = {
    val bc = spark.sparkContext.broadcast(this)
    spark.udf.register(fnName,
      (x: Double, y: Double) => bc.value.containingPoint(x, y).headOption.orNull)
  }
}

object Locator {

  /** add_bbox (src/flex-lua-locator.cpp) */
  def fromBoxes(named: Seq[(String, Box)]): Locator =
    new Locator(named.map { case (n, b) =>
      Region(n, NullGeom(), b)
    }.toVector)

  /** add_from_db analog: regions from a DataFrame of (name, ewkb). */
  def fromDataFrame(df: DataFrame): Locator = {
    val regions = df.select(col("name"), col("geom")).collect().map { row =>
      val g = Ewkb.decode(row.getAs[Array[Byte]]("geom"))
      Region(row.getString(0), g, Box.of(g).getOrElse(Box(0, 0, 0, 0)))
    }
    new Locator(regions.toVector)
  }

  def fromGeometries(named: Seq[(String, Geometry)]): Locator =
    new Locator(named.map { case (n, g) =>
      Region(n, g, Box.of(g).getOrElse(Box(0, 0, 0, 0)))
    }.toVector)

  /** Mixed region list (bbox regions keep inclusive box semantics —
    * a point on a shared corner is in BOTH, locator.feature). */
  def fromRegions(regions: Seq[Region]): Locator =
    new Locator(regions.toVector)
}
