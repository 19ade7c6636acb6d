package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/unitable.lua — every OSM object in one
  * any-ids table (osm_type N/W/R + positive osm_id), object
  * attributes (version, timestamp) in a jsonb column, nodes as
  * points, ways as linestrings, relations as geometry collections;
  * invalid geometries still insert with NULL geom. */
object Unitable extends FlexConfig {

  private val data = FlexTableDef("unitable_data", FlexIds.AnyObject, Seq(
    FlexColumn("attrs", FlexType.Json),
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Geometry)),
    typeColumn = Some("osm_type"))

  override def tables: Seq[FlexTableDef] = Seq(data)

  /** unitable.lua's clean_tags: drop a fixed key set; skip the object
    * when nothing is left. */
  private def cleaned(tags: Column): Column =
    map_filter(tags, (k, _) =>
      !k.isin("odbl", "created_by", "source", "source:ref"))

  private def attrsJson(df: DataFrame): Column = {
    def opt(name: String): Column =
      if (df.columns.contains(name)) col(name) else lit(null)
    to_json(struct(opt("version").as("version"),
      opt("timestamp").as("timestamp")))
  }

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
    val t = nodes.withColumn("__t", cleaned(col("tags")))
      .where(size(col("__t")) > 0)
    Map("unitable_data" -> t.select(
      lit("N").as("osm_type"), col("id").as("osm_id"),
      attrsJson(nodes).as("attrs"), col("__t").as("tags"),
      FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))
  }

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val t = ways.withColumn("__t", cleaned(col("tags")))
      .where(size(col("__t")) > 0)
    Map("unitable_data" -> t.select(
      lit("W").as("osm_type"), col("id").as("osm_id"),
      attrsJson(ways).as("attrs"), col("__t").as("tags"),
      col("__geom").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val t = rels.withColumn("__t", cleaned(col("tags")))
      .where(size(col("__t")) > 0)
    Map("unitable_data" -> t.select(
      lit("R").as("osm_type"), col("id").as("osm_id"),
      attrsJson(rels).as("attrs"), col("__t").as("tags"),
      FlexGeom.asCollection()(col("__mnlons"), col("__mnlats"),
        col("__mlons"), col("__mlats")).as("geom")))
  }
}
