package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every query entry receives `(spark, sfDir)`; these helpers centralize
  * the parquet reads so Catalyst sees plain file scans (filter/column
  * pushdown works untouched).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped in two layouts across testdata generations:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * readable only as raw int64 nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and native TIMESTAMP(MICROS).
    * Adapt to whichever schema is on disk so both generations surface the
    * same microsecond timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw =
      try load(s, d, "events")
      catch {
        case e: Exception if e.getMessage != null &&
            e.getMessage.contains("nanosAsLong") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-int64 layout
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // native timestamp without zone: normalize to TimestampType so
        // downstream timestamp functions (unix_micros, windows) see the
        // same type both layouts produced; session tz is UTC so the
        // instant is unchanged.
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
