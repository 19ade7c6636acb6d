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

  /** Retention cohorts — the standard activity-retention triangle:
    * every user's cohort is their first active epoch-week
    * (floor(epoch_seconds / 604800) — pure integer weeks, no
    * calendar functions, so any engine reproduces it bit-exactly);
    * each (cohort_week, week_offset) cell counts the distinct cohort
    * users active that many weeks later.
    *
    * Scale shape: one aggregate per user for the cohort (shuffle on
    * the user key), a broadcast-sized cohort map joined back, then
    * one distinct-count aggregate on (cohort, offset) — no windows,
    * no self-join over events. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val week = floor(unix_micros(col(tsCol)) / 604800000000L)
      .cast("long")
    val active = events.select(col(userCol).as("u"), week.as("week"))
      .distinct()
    val cohorts = active.groupBy(col("u"))
      .agg(min(col("week")).as("cohort_week"))
    active.join(cohorts, "u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
