package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/indexes.lua — the index-definition
  * surface: explicit empty index list, default geometry GiST,
  * several explicit GiSTs, btree on plain columns, multi-column with
  * where-condition, and a named expression index. */
object Indexes extends FlexConfig {

  private val pois = FlexTableDef("indexes_pois", FlexIds.Node,
    Seq(FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Point, notNull = true)),
    indexes = Some(Nil), // explicitly NO indexes
    idColumn = "node_id")

  private val ways = FlexTableDef("indexes_ways", FlexIds.Way,
    Seq(FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))
    // indexes not set: default geometry GiST

  private val polygons = FlexTableDef("indexes_polygons", FlexIds.Area,
    Seq(FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Geometry, notNull = true),
      FlexColumn("center", FlexType.Point, notNull = true)),
    indexes = Some(Seq(
      FlexIndex(method = "gist", columns = Seq("geom")),
      FlexIndex(method = "gist", columns = Seq("center")))))

  private val pubs = FlexTableDef("indexes_pubs", FlexIds.Node,
    Seq(FlexColumn("name", FlexType.Text),
      FlexColumn("geom", FlexType.Geometry, notNull = true)),
    indexes = Some(Seq(
      FlexIndex(method = "gist", columns = Seq("geom")),
      FlexIndex(method = "btree", columns = Seq("name")))))

  private val roads = FlexTableDef("indexes_roads", FlexIds.Way,
    Seq(FlexColumn("name", FlexType.Text),
      FlexColumn("type", FlexType.Text),
      FlexColumn("ref", FlexType.Text),
      FlexColumn("geom", FlexType.Linestring, notNull = true)),
    indexes = Some(Seq(
      FlexIndex(method = "btree", columns = Seq("name", "ref")),
      FlexIndex(method = "gist", columns = Seq("geom"),
        where = "type='primary'"))))

  private val postboxes = FlexTableDef("indexes_postboxes", FlexIds.Node,
    Seq(FlexColumn("operator", FlexType.Text),
      FlexColumn("geom", FlexType.Point, notNull = true)),
    indexes = Some(Seq(
      FlexIndex(method = "btree", expression = "lower(operator)",
        name = "postbox_operator_idx"))))

  override def tables: Seq[FlexTableDef] =
    Seq(pois, ways, polygons, pubs, roads, postboxes)

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
    val pt = FlexGeom.asPoint()(col("lon"), col("lat"))
    Map(
      "indexes_pois" -> tagged.select(col("id").as("node_id"),
        col("tags").as("tags"), pt.as("geom")),
      "indexes_pubs" -> tagged
        .where(col("tags").getItem("amenity") === "pub")
        .select(col("id").as("osm_id"),
          col("tags").getItem("name").as("name"), pt.as("geom")),
      "indexes_postboxes" -> tagged
        .where(col("tags").getItem("amenity") === "post_box")
        .select(col("id").as("osm_id"),
          col("tags").getItem("operator").as("operator"), pt.as("geom")))
  }

  override def processWays(ways0: DataFrame): Map[String, DataFrame] = {
    val tagged = ways0.where(size(col("tags")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val isArea = coalesce(closed, lit(false)) && hasAreaTags(col("tags"))
    Map(
      "indexes_polygons" -> tagged.where(isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom"),
          FlexGeom.wayPolygonCentroid(graft.geom.Srid.WebMercator)(
            col("__lons"), col("__lats")).as("center")),
      "indexes_ways" -> tagged.where(!isArea)
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          col("__geom").as("geom")),
      "indexes_roads" -> tagged
        .where(col("tags").getItem("highway").isNotNull)
        .select(col("id").as("osm_id"),
          col("tags").getItem("name").as("name"),
          col("tags").getItem("highway").as("type"),
          col("tags").getItem("ref").as("ref"),
          col("__geom").as("geom")))
  }
}
