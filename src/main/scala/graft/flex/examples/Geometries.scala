package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.geom.Srid

/** Typed port of flex-config/geometries.lua — the geometry-options
  * tutorial: mixed projections per column (3857 points, 4326 lines),
  * a nullable geometry column next to planar + spherical area
  * columns, segmentized way pieces, line_merge'd boundary
  * multilinestrings, and a geometry-less pubs table. */
object Geometries extends FlexConfig {

  private val pois = FlexTableDef("geometries_pois", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point, notNull = true)))

  private val ways = FlexTableDef("geometries_ways", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring, projection = Srid.WGS84,
      notNull = true)))

  private val polygons = FlexTableDef("geometries_polygons",
    FlexIds.Area, Seq(
      FlexColumn("tags", FlexType.Json),
      // nullable geometry: invalid assemblies land as NULL here
      FlexColumn("geom", FlexType.Geometry, projection = Srid.WGS84),
      FlexColumn("area", FlexType.Real),
      FlexColumn("spherical_area", FlexType.Real)))

  private val boundaries = FlexTableDef("geometries_boundaries",
    FlexIds.Relation, Seq(
      FlexColumn("type", FlexType.Text),
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Multilinestring, notNull = true)))

  private val pubs = FlexTableDef("geometries_pubs", FlexIds.Node, Seq(
    FlexColumn("name", FlexType.Text)))

  override def tables: Seq[FlexTableDef] =
    Seq(pois, ways, polygons, boundaries, pubs)

  private val areaKeys: Seq[String] = Seq(
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway")
  private def hasAreaTags(tags: Column): Column =
    when(tags.getItem("area") === "yes", lit(true))
      .when(tags.getItem("area") === "no", lit(false))
      .otherwise(arrays_overlap(map_keys(tags),
        array(areaKeys.map(lit): _*)))

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
    val tagged = nodes.where(size(col("tags")) > 0)
    Map(
      "geometries_pois" -> tagged.select(col("id").as("osm_id"),
        col("tags").as("tags"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")),
      "geometries_pubs" -> tagged
        .where(col("tags").getItem("amenity") === "pub")
        .select(col("id").as("osm_id"),
          col("tags").getItem("name").as("name")))
  }

  override def processWays(ways0: DataFrame): Map[String, DataFrame] = {
    val tagged = ways0.where(size(col("tags")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val isArea = coalesce(closed, lit(false)) && hasAreaTags(col("tags"))
    Map(
      "geometries_polygons" -> tagged.where(isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          FlexGeom.asPolygon(Srid.WGS84)(col("__lons"), col("__lats"))
            .as("geom"),
          FlexGeom.wayPolygonArea(Srid.WebMercator)(
            col("__lons"), col("__lats")).cast("float").as("area"),
          FlexGeom.wayPolygonSphericalArea()(
            col("__lons"), col("__lats")).cast("float")
            .as("spherical_area")),
      // segmentize(1) in 4326 units, one row per piece
      "geometries_ways" -> tagged.where(!isArea)
        .withColumn("__piece", explode(
          FlexGeom.linePieces(Srid.WGS84, 1.0)(
            col("__lons"), col("__lats"))))
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          col("__piece").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val typed = rels
      .withColumn("__type", col("tags").getItem("type"))
      .withColumn("__t",
        map_filter(col("tags"), (k, _) => k =!= "type"))
    Map(
      "geometries_boundaries" -> typed.where(col("__type") === "boundary")
        .select(col("id").as("osm_id"),
          col("__t").getItem("boundary").as("type"),
          map_filter(col("__t"), (k, _) => k =!= "boundary").as("tags"),
          FlexGeom.asMultiLinestring(Srid.WebMercator, merge = true)(
            col("__mlons"), col("__mlats")).as("geom")),
      "geometries_polygons" -> typed
        .where(col("__type") === "multipolygon")
        .select((-col("id")).as("osm_id"), col("__t").as("tags"),
          FlexGeom.asMultiPolygon(Srid.WGS84)(
            col("__mlons"), col("__mlats")).as("geom"),
          FlexGeom.mpArea(Srid.WebMercator)(
            col("__mlons"), col("__mlats")).cast("float").as("area"),
          FlexGeom.mpSphericalArea()(col("__mlons"), col("__mlats"))
            .cast("float").as("spherical_area")))
  }
}
