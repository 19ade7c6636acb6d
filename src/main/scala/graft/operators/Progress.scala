package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Import progress / statistics counters (reference:
  * src/progress-display.cpp:1-121 tracks per-type node/way/relation
  * counts and rates; src/flex-table.hpp:337-342 keeps per-table insert
  * and not-null-violation counters).
  *
  * Spark-first shape: observable metrics — `df.observe` fuses the
  * counters into whatever pass already runs (no second scan, no
  * accumulator plumbing, exactly-once semantics per action), and the
  * driver reads them from the [[Observation]] handle after any action,
  * or from `QueryProgressEvent` in streams. */
object Progress {

  /** Attach row/action counters to an entity frame. Returns the
    * instrumented frame and the handle to read after an action. When
    * the frame carries the change-file `action` column, per-action
    * counts (the reference's add/modify/delete statistics) are
    * included. */
  def entityCounts(df: DataFrame,
      name: String = "progress"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val actionCols =
      if (df.columns.contains("action"))
        Seq("create", "modify", "delete").map(a =>
          sum(when(col("action") === a, 1L).otherwise(0L)).as(s"n_$a"))
      else Nil
    (df.observe(obs, count(lit(1)).as("n_rows"), actionCols: _*), obs)
  }

  /** Per-table insert statistics for a flex-style output frame: total
    * rows plus a count of rows that violated a NOT NULL contract on
    * `notNullCols` (the reference counts these as soft errors,
    * src/output-flex.cpp:828-838). */
  def insertCounts(df: DataFrame, notNullCols: Seq[String],
      name: String = "inserts"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val viol =
      if (notNullCols.isEmpty) lit(0L)
      else sum(when(notNullCols.map(c => col(c).isNull).reduce(_ || _), 1L)
        .otherwise(0L))
    (df.observe(obs, count(lit(1)).as("n_rows"),
      viol.as("n_null_violations")), obs)
  }
}
