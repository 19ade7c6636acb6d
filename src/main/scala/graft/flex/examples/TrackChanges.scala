package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/track-changes.lua — a NoIndex change
  * log: in append mode every object from the change file logs one
  * row with action A (version 1), M (modified) or D (deleted). Rows
  * are never deleted (ids = nil disables id tracking). In create
  * mode (no `action` column on the frames) nothing is logged, like
  * the Lua mode check. */
object TrackChanges extends FlexConfig {

  private val changeLog = FlexTableDef("change_log", FlexIds.NoIndex,
    Seq(
      FlexColumn("osm_type", FlexType.Text),
      FlexColumn("osm_id", FlexType.Int8),
      FlexColumn("version", FlexType.Int4),
      FlexColumn("action", FlexType.Text),
      FlexColumn("date", FlexType.Text,
        sqlTypeOverride = Some("timestamp"))),
    indexes = Some(Seq(FlexIndex(method = "btree",
      columns = Seq("osm_type", "osm_id")))))

  override def tables: Seq[FlexTableDef] = Seq(changeLog)

  private def changes(df: DataFrame, otype: String)
      : Option[(String, DataFrame)] =
    if (!df.columns.contains("action") ||
        !df.columns.contains("__mode")) None
    else {
      def opt(name: String): Column =
        if (df.columns.contains(name)) col(name) else lit(null)
      Some("change_log" -> df.where(col("__mode") === "append").select(
        lit(otype).as("osm_type"),
        col("id").as("osm_id"),
        opt("version").cast("int").as("version"),
        when(col("action") === "delete", "D")
          .when(opt("version").cast("int") === 1, "A")
          .otherwise("M").as("action"),
        when(opt("timestamp").isNotNull,
          date_format(timestamp_seconds(opt("timestamp")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("date")))
    }

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    changes(nodes, "node").toMap
  override def processWays(ways: DataFrame): Map[String, DataFrame] =
    changes(ways, "way").toMap
  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    changes(rels, "relation").toMap
}
