package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Relation processing from the CLI (the shape of the reference's
  * flex-config/route-relations.lua `routes` table): one table of
  * `type=route` relations — route kind, ref, name, member count — with
  * NO geometry column (flex tables don't need one). Runnable via
  * `-O flex -S graft.flex.examples.RouteRelations`. */
object RouteRelations extends FlexConfig {

  private val routes = FlexTableDef("flex_routes", FlexIds.Relation, Seq(
    FlexColumn("route", FlexType.Text, notNull = true),
    FlexColumn("ref", FlexType.Text),
    FlexColumn("name", FlexType.Text),
    FlexColumn("n_members", FlexType.Int4)))

  override def tables: Seq[FlexTableDef] = Seq(routes)

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map("flex_routes" -> rels
      .where(col("tags").getItem("type") === "route" &&
        col("tags").getItem("route").isNotNull)
      .select(col("id").as("osm_id"),
        col("tags").getItem("route").as("route"),
        col("tags").getItem("ref").as("ref"),
        col("tags").getItem("name").as("name"),
        size(col("members")).as("n_members")))
}
