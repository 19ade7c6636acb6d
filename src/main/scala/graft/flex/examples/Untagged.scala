package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/untagged.lua — the
  * process_untagged_node/way callbacks: untagged objects land too
  * (with NULL tags), tagged ones keep their jsonb tags. In the
  * set-at-a-time form both callbacks are one frame with a
  * tagged-or-not projection. */
object Untagged extends FlexConfig {

  private val nodes = FlexTableDef("untagged_nodes", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point)))

  private val ways = FlexTableDef("untagged_ways", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring)))

  override def tables: Seq[FlexTableDef] = Seq(nodes, ways)

  override def processNodes(nodes0: DataFrame): Map[String, DataFrame] =
    Map("untagged_nodes" -> nodes0.select(
      col("id").as("osm_id"),
      // untagged objects insert without the field (NULL tags)
      when(size(col("tags")) > 0, col("tags")).as("tags"),
      FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))

  override def processWays(ways0: DataFrame): Map[String, DataFrame] =
    Map("untagged_ways" -> ways0.select(
      col("id").as("osm_id"),
      when(size(col("tags")) > 0, col("tags")).as("tags"),
      col("__geom").as("geom")))
}
