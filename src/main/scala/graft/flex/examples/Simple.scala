package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/simple.lua — the tutorial config: a POI
  * table plus a special restaurants table from nodes, a way table, an
  * area table fed from closed ways and multipolygon/boundary
  * relations (its `type` column records the OSM object type). */
object Simple extends FlexConfig {

  private val pois = FlexTableDef("simple_pois", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point, notNull = true)))

  private val restaurants = FlexTableDef("simple_restaurants",
    FlexIds.Node, Seq(
      FlexColumn("name", FlexType.Text),
      FlexColumn("cuisine", FlexType.Text),
      FlexColumn("geom", FlexType.Point, notNull = true)))

  private val ways = FlexTableDef("simple_ways", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring, notNull = true)))

  private val polygons = FlexTableDef("simple_polygons", FlexIds.Area, Seq(
    FlexColumn("type", FlexType.Text),
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Geometry, notNull = true)))

  override def tables: Seq[FlexTableDef] =
    Seq(pois, restaurants, ways, polygons)

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
    val tagged = nodes.where(size(col("tags")) > 0)
    val isRestaurant = col("tags").getItem("amenity") === "restaurant"
    Map(
      "simple_restaurants" -> tagged.where(isRestaurant)
        .select(col("id").as("osm_id"),
          col("tags").getItem("name").as("name"),
          col("tags").getItem("cuisine").as("cuisine"),
          FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")),
      "simple_pois" -> tagged.where(!coalesce(isRestaurant, lit(false)))
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))
  }

  override def processWays(ways0: DataFrame): Map[String, DataFrame] = {
    val tagged = ways0.where(size(col("tags")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    Map(
      "simple_polygons" -> tagged.where(coalesce(closed, lit(false)))
        .select(col("id").as("osm_id"), lit("way").as("type"),
          col("tags").as("tags"),
          FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom")),
      "simple_ways" -> tagged.where(!coalesce(closed, lit(false)))
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          col("__geom").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map("simple_polygons" -> rels
      .where(col("tags").getItem("type").isin("multipolygon", "boundary"))
      .select((-col("id")).as("osm_id"), lit("relation").as("type"),
        col("tags").as("tags"),
        FlexGeom.asMultiPolygon()(col("__mlons"), col("__mlats"))
          .as("geom")))
}
