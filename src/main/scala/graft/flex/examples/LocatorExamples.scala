package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.flex._
import graft.geom._
import graft.operators.Locator
import graft.sources.OsmXml.OsmDataFrames

/** Typed ports of the flex-config/locator/ examples.
  *
  * import-countries.lua → [[LocatorCountries]]: admin_level=2
  * boundaries with a syntactically valid ISO3166-1 code, one row per
  * polygon piece, 4326.
  *
  * buildings.lua → [[LocatorBuildings]] and motorway-colours.lua →
  * [[LocatorMotorwayColours]]: the countries locator classifies
  * buildings/highways. The Lua versions read the previously imported
  * countries table via add_from_db; the typed ports derive the same
  * region set from the input frames inline (same filter), then run
  * the broadcast point-classify — the variant the Lua file itself
  * suggests ("or use geom:centroid()").
  *
  * iceland.lua → [[LocatorIceland]]: an add_bbox region used as an
  * import filter — only highways intersecting the box land.
  */
object LocatorSupport {

  /** The import-countries.lua region extraction, driver-side: the
    * region list is small (countries), exactly the reference's
    * in-memory locator build (src/locator.cpp). */
  def countriesLocator(osm: OsmDataFrames): Locator = {
    val rels = osm.relations
      .where(col("tags").getItem("boundary") === "administrative" &&
        col("tags").getItem("admin_level") === "2" &&
        col("tags").getItem("ISO3166-1").rlike("^[A-Z]{2}$"))
      .select(col("tags").getItem("ISO3166-1").as("code"),
        col("__mlons"), col("__mlats"))
    val regions = rels.collect().flatMap { r =>
      val code = r.getString(0)
      val mlons = r.getAs[scala.collection.Seq[
        scala.collection.Seq[Double]]](1)
      val mlats = r.getAs[scala.collection.Seq[
        scala.collection.Seq[Double]]](2)
      if (mlons == null) Nil
      else FromOsm.createMultiPolygon(mlons.zip(mlats).map {
        case (lo, la) =>
          lo.zip(la).map { case (x, y) => Pt(x, y) }.toSeq
      }.toSeq) match {
        case _: NullGeom => Nil
        case g => GeomOps.splitMulti(g).map(p => code -> p)
      }
    }
    Locator.fromGeometries(regions.toSeq)
  }

  /** first_intersecting / all_intersecting over the centroid of a way
    * polygon or linestring (4326 coords in, region names out). */
  def firstOf(loc: Locator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null || lons.isEmpty) null
      else {
        val c = GeomOps.centroid(FromOsm.createLineString(
          lons.zip(lats).map { case (x, y) => Pt(x, y) }))
        c match {
          case Point(p, _) => loc.containingPoint(p.x, p.y).headOption.orNull
          case _           => null
        }
      })

  def allOf(loc: Locator): UserDefinedFunction =
    udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null || lons.isEmpty) null
      else {
        val c = GeomOps.centroid(FromOsm.createLineString(
          lons.zip(lats).map { case (x, y) => Pt(x, y) }))
        c match {
          case Point(p, _) =>
            "{" + loc.containingPoint(p.x, p.y).mkString(",") + "}"
          case _ => null
        }
      })
}

object LocatorCountries extends FlexConfig {

  private val countries = FlexTableDef("locator_countries",
    FlexIds.Relation, Seq(
      FlexColumn("code", FlexType.Text, notNull = true),
      FlexColumn("geom", FlexType.Polygon, projection = Srid.WGS84,
        notNull = true)))

  override def tables: Seq[FlexTableDef] = Seq(countries)

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map("locator_countries" -> rels
      .where(col("tags").getItem("boundary") === "administrative" &&
        col("tags").getItem("admin_level") === "2" &&
        col("tags").getItem("ISO3166-1").rlike("^[A-Z]{2}$"))
      .withColumn("__pg", explode(
        FlexGeom.polygonPieces(Srid.WGS84)(
          col("__mlons"), col("__mlats"))))
      .select(col("id").as("osm_id"),
        col("tags").getItem("ISO3166-1").as("code"),
        col("__pg._1").as("geom")))
}

object LocatorBuildings extends FlexConfig {

  private val buildings = FlexTableDef("locator_buildings",
    FlexIds.Area, Seq(
      FlexColumn("country", FlexType.Text),
      FlexColumn("countries", FlexType.Text,
        sqlTypeOverride = Some("text[]")),
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Polygon, notNull = true)))

  override def tables: Seq[FlexTableDef] = Seq(buildings)

  override def processGraph(osm: OsmDataFrames): Map[String, DataFrame] = {
    val loc = LocatorSupport.countriesLocator(osm)
    val first = LocatorSupport.firstOf(loc)
    val all = LocatorSupport.allOf(loc)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val wayRows = osm.ways
      .where(col("tags").getItem("building").isNotNull &&
        coalesce(closed, lit(false)))
      .select(col("id").as("osm_id"),
        first(col("__lons"), col("__lats")).as("country"),
        all(col("__lons"), col("__lats")).as("countries"),
        col("tags").as("tags"),
        FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom"))
    val relRows = osm.relations
      .where(col("tags").getItem("building").isNotNull)
      .withColumn("__pg", explode(FlexGeom.polygonPieces(Srid.WGS84)(
        col("__mlons"), col("__mlats"))))
      .select((-col("id")).as("osm_id"),
        pieceFirst(loc)(col("__pg._1")).as("country"),
        pieceAll(loc)(col("__pg._1")).as("countries"),
        col("tags").as("tags"),
        reproject3857(col("__pg._1")).as("geom"))
    Map("locator_buildings" -> wayRows.unionByName(relRows))
  }

  private def pieceFirst(loc: Locator): UserDefinedFunction =
    udf((ewkb: Array[Byte]) =>
      if (ewkb == null) null
      else GeomOps.centroid(Ewkb.decode(ewkb)) match {
        case Point(p, _) => loc.containingPoint(p.x, p.y).headOption.orNull
        case _           => null
      })

  private def pieceAll(loc: Locator): UserDefinedFunction =
    udf((ewkb: Array[Byte]) =>
      if (ewkb == null) null
      else GeomOps.centroid(Ewkb.decode(ewkb)) match {
        case Point(p, _) =>
          "{" + loc.containingPoint(p.x, p.y).mkString(",") + "}"
        case _ => null
      })

  private def reproject3857(c: Column): Column =
    udf((ewkb: Array[Byte]) =>
      if (ewkb == null) null
      else Ewkb.encode(GeomOps.transform(Ewkb.decode(ewkb),
        Srid.WebMercator))).apply(c)
}

object LocatorMotorwayColours extends FlexConfig {

  private val highways = FlexTableDef("locator_highways", FlexIds.Way,
    Seq(
      FlexColumn("hwtype", FlexType.Text),
      FlexColumn("country", FlexType.Text),
      FlexColumn("colour", FlexType.Text),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))

  override def tables: Seq[FlexTableDef] = Seq(highways)

  private val cc2colour = Map(
    "BE" -> "#2d00e5", "CH" -> "#128044", "DE" -> "#174688",
    "FR" -> "#333b97", "NL" -> "#064269")

  override def processGraph(osm: OsmDataFrames): Map[String, DataFrame] = {
    val loc = LocatorSupport.countriesLocator(osm)
    val first = LocatorSupport.firstOf(loc)
    val colourOf = udf((cc: String) => cc2colour.get(cc).orNull)
    val resolved = graft.operators.Middle.resolveAllWayCoords(osm)
    Map("locator_highways" -> osm.ways
      .where(col("tags").getItem("highway").isNotNull)
      .join(resolved, col("id") === col("rwid"), "left")
      .withColumn("__cc", first(col("wlons"), col("wlats")))
      .select(col("id").as("osm_id"),
        col("tags").getItem("highway").as("hwtype"),
        col("__cc").as("country"),
        colourOf(col("__cc")).as("colour"),
        FlexGeom.asLinestring()(col("wlons"), col("wlats")).as("geom")))
  }
}

object LocatorIceland extends FlexConfig {

  private val highways = FlexTableDef("locator_is_highways", FlexIds.Way,
    Seq(
      FlexColumn("hwtype", FlexType.Text, notNull = true),
      FlexColumn("name", FlexType.Text),
      FlexColumn("ref", FlexType.Text),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))

  override def tables: Seq[FlexTableDef] = Seq(highways)

  /** iceland.lua:9 — add_bbox('IS', -25, 62, -12, 68). */
  private val iceland =
    Locator.fromBoxes(Seq("IS" -> Box(-25.0, 62.0, -12.0, 68.0)))

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val first = LocatorSupport.firstOf(iceland)
    Map("locator_is_highways" -> ways
      .where(col("tags").getItem("highway").isNotNull)
      .withColumn("__r", first(col("__lons"), col("__lats")))
      .where(col("__r").isNotNull)
      .select(col("id").as("osm_id"),
        col("tags").getItem("highway").as("hwtype"),
        col("tags").getItem("name").as("name"),
        col("tags").getItem("ref").as("ref"),
        col("__geom").as("geom")))
  }
}
