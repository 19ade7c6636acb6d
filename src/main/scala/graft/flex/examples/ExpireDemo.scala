package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.operators.TileCover

/** Typed port of flex-config/expire.lua — the expire surface: a
  * file-form output (z14), a table-form output (z14), a
  * min/max-zoom table output (z10-14) with boundary-only mode, and
  * one geometry column with no expire at all. */
object ExpireDemo extends FlexConfig {

  private val poisOut = FlexExpireOutput("expiredemo_pois",
    filename = Some("pois.tiles"), maxzoom = 14)
  private val linesOut = FlexExpireOutput("expiredemo_lines",
    table = Some("lines_tiles"), maxzoom = 14)
  private val polysOut = FlexExpireOutput("expiredemo_polygons",
    table = Some("polygons_tiles"), maxzoom = 14,
    minzoomOpt = Some(10))

  private val pois = FlexTableDef("expiredemo_pois", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point, notNull = true,
      expire = Seq(FlexExpireRef(poisOut)))))

  private val lines = FlexTableDef("expiredemo_lines", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring, notNull = true,
      expire = Seq(FlexExpireRef(linesOut)))))

  private val polygons = FlexTableDef("expiredemo_polygons",
    FlexIds.Area, Seq(
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Geometry, notNull = true,
        expire = Seq(FlexExpireRef(polysOut,
          mode = TileCover.BoundaryOnly)))))

  private val boundaries = FlexTableDef("expiredemo_boundaries",
    FlexIds.Relation, Seq(
      FlexColumn("type", FlexType.Text),
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Multilinestring, notNull = true)))

  override def tables: Seq[FlexTableDef] =
    Seq(pois, lines, polygons, boundaries)

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

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("expiredemo_pois" -> nodes.where(size(col("tags")) > 0)
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val tagged = ways.where(size(col("tags")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val isArea = coalesce(closed, lit(false)) && hasAreaTags(col("tags"))
    Map(
      "expiredemo_polygons" -> tagged.where(isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom")),
      "expiredemo_lines" -> tagged.where(!isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          col("__geom").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val typed = rels
      .withColumn("__type", col("tags").getItem("type"))
      .withColumn("__t",
        map_filter(col("tags"), (k, _) => k =!= "type"))
    Map(
      "expiredemo_boundaries" -> typed.where(col("__type") === "boundary")
        .select(col("id").as("osm_id"),
          col("__t").getItem("boundary").as("type"),
          map_filter(col("__t"), (k, _) => k =!= "boundary").as("tags"),
          FlexGeom.asMultiLinestring(merge = true)(
            col("__mlons"), col("__mlats")).as("geom")),
      "expiredemo_polygons" -> typed
        .where(col("__type") === "multipolygon")
        .select((-col("id")).as("osm_id"), col("__t").as("tags"),
          FlexGeom.asMultiPolygon()(col("__mlons"), col("__mlats"))
            .as("geom")))
  }
}
