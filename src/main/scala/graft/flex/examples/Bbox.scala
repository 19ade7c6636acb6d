package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/bbox.lua — get_bbox() on every object,
  * formatted as the PostGIS box2d text form
  * `BOX(xmin ymin,xmax ymax)` (bbox.lua:71-80). */
object Bbox extends FlexConfig {

  private def cols(extra: FlexColumn*): Seq[FlexColumn] =
    extra ++ Seq(
      FlexColumn("tags", FlexType.Json),
      FlexColumn("bbox", FlexType.Text, sqlTypeOverride = Some("box2d")))

  private val pois = FlexTableDef("bbox_pois", FlexIds.Node,
    cols() :+ FlexColumn("geom", FlexType.Point))
  private val ways = FlexTableDef("bbox_ways", FlexIds.Way,
    cols() :+ FlexColumn("geom", FlexType.Linestring))
  private val polygons = FlexTableDef("bbox_polygons", FlexIds.Area,
    cols() :+ FlexColumn("geom", FlexType.Geometry))
  private val boundaries = FlexTableDef("bbox_boundaries",
    FlexIds.Relation,
    cols(FlexColumn("type", FlexType.Text)) :+
      FlexColumn("geom", FlexType.Multilinestring))

  override def tables: Seq[FlexTableDef] =
    Seq(pois, ways, polygons, boundaries)

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

  /** format_bbox over coordinate arrays (4326, like get_bbox). */
  private def bboxOf(lons: Column, lats: Column): Column =
    when(lons.isNotNull && size(lons) > 0,
      concat(lit("BOX("),
        array_min(lons), lit(" "), array_min(lats), lit(","),
        array_max(lons), lit(" "), array_max(lats), lit(")")))

  private def bboxOfNested(mlons: Column, mlats: Column): Column =
    bboxOf(flatten(mlons), flatten(mlats))

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("bbox_pois" -> nodes.where(size(col("tags")) > 0)
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        concat(lit("BOX("), col("lon"), lit(" "), col("lat"), lit(","),
          col("lon"), lit(" "), col("lat"), lit(")")).as("bbox"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))

  override def processWays(ways0: DataFrame): Map[String, DataFrame] = {
    val tagged = ways0.where(size(col("tags")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val isArea = coalesce(closed, lit(false)) && hasAreaTags(col("tags"))
    Map(
      "bbox_polygons" -> tagged.where(isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          bboxOf(col("__lons"), col("__lats")).as("bbox"),
          FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom")),
      "bbox_ways" -> tagged.where(!isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          bboxOf(col("__lons"), col("__lats")).as("bbox"),
          col("__geom").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val typed = rels
      .withColumn("__type", col("tags").getItem("type"))
      .withColumn("__t",
        map_filter(col("tags"), (k, _) => k =!= "type"))
    Map(
      "bbox_boundaries" -> typed.where(col("__type") === "boundary")
        .select(col("id").as("osm_id"),
          col("__t").getItem("boundary").as("type"),
          col("__t").as("tags"),
          bboxOfNested(col("__mlons"), col("__mlats")).as("bbox"),
          FlexGeom.asMultiLinestring()(col("__mlons"), col("__mlats"))
            .as("geom")),
      "bbox_polygons" -> typed.where(col("__type") === "multipolygon")
        .select((-col("id")).as("osm_id"), col("__t").as("tags"),
          bboxOfNested(col("__mlons"), col("__mlats")).as("bbox"),
          FlexGeom.asMultiPolygon()(col("__mlons"), col("__mlats"))
            .as("geom")))
  }
}
