package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming form of the incremental machinery (SURVEY.md
  * §2.8): the reference's append mode is a batch-incremental job, and
  * the same transforms run as a stream — `.osc`-shaped change records
  * flow through latest-version-wins state and windowed rollups.
  *
  * OSM replication delivers ordered, complete diffs, so watermarks only
  * bound state size, not correctness.
  */
object Streams {

  final case class Change(oid: Long, version: Long, visible: Boolean,
      ts: java.sql.Timestamp)
  final case class ObjectState(oid: Long, version: Long, visible: Boolean)

  /** Stateful latest-version-wins over a change stream:
    * mapGroupsWithState keyed by object id — the streaming equivalent
    * of Update.latestVersion. Emits the current state per key on every
    * update. */
  def latestVersionStream(changes: Dataset[Change]): Dataset[ObjectState] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.oid)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (oid: Long, updates: Iterator[Change], state: GroupState[ObjectState]) =>
          val incoming = updates.maxBy(_.version)
          val merged = state.getOption match {
            case Some(s) if s.version >= incoming.version => s
            case _ =>
              ObjectState(oid, incoming.version, incoming.visible)
          }
          state.update(merged)
          merged
      }
  }

  /** Windowed dirty-tile rollup: the streaming form of the expire
    * aggregation — per processing window, the distinct tiles touched.
    * Watermark bounds state; append mode emits closed windows. */
  def windowedTileCounts(events: DataFrame, lonCol: String, latCol: String,
      zoom: Int, windowLen: String, watermark: String): DataFrame = {
    import graft.functions.TileFunctions._
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), windowLen),
        tileX(col(lonCol), zoom).as("x"),
        tileYLinear(col(latCol), zoom).as("y"))
      .agg(count(lit(1)).as("n_events"))
  }
}
