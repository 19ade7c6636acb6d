package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch form of a session window, the
  * standard first step of event-log pipelines (and the batch twin of
  * Structured Streaming's `session_window`). Not in the OSM reference
  * (SURVEY §2.9 declares no window engine there); this is part of the
  * beyond-reference training-data surface.
  *
  * Scale shape: one shuffle on the user key, then per-partition sorted
  * scans (window lag + running sum) — no driver state, no self-join.
  * Skewed power users are single-key bounded by their own event counts,
  * and AQE's skew handling applies to the shuffle.
  */
object Sessions {

  /** Assign a per-user session index: a new session starts when the gap
    * from the previous event exceeds `gapSeconds`. Ties on the
    * timestamp are broken by `tieCol` so the numbering is deterministic
    * under any partitioning. Adds `session_idx` (1-based, per user). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(order)
    val isNew = when(
      prev.isNull ||
        unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-user session statistics: session count, total events, largest
    * session (events), and longest session duration in microseconds —
    * all integers, so the result is exact and partitioning-independent. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val s = sessionize(events, userCol, tsCol, tieCol, gapSeconds)
    val perSession = s.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("dur_us"))
    perSession.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        max(col("dur_us")).as("max_session_dur_us"))
  }
}
