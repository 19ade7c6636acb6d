package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/with-schema.lua — a way table declared
  * in its own PostgreSQL schema (define_table's schema field); the
  * live loader creates the schema and qualifies the table with it. */
object WithSchema extends FlexConfig {

  private val data = FlexTableDef("withschema_data", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring)),
    schemaName = Some("myschema"))

  override def tables: Seq[FlexTableDef] = Seq(data)

  override def processWays(ways: DataFrame): Map[String, DataFrame] =
    Map("withschema_data" -> ways.where(size(col("tags")) > 0)
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        col("__geom").as("geom")))
}
