package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle of the persisted LSH band index — the artifact a
  * production dedup pipeline keeps between corpus snapshots so a
  * re-crawl joins against the index instead of re-scanning the
  * corpus ([[Dedup.bandIndex]] builds the rows;
  * [[Dedup.incrementalNearDupCandidates]] probes them). Round 8 left
  * the index append-only; this adds the missing maintenance half:
  * DELETES (documents removed from the corpus must stop surfacing as
  * candidates) and a COMPACTION whose rewrite cost is bounded by the
  * dirty set, not the index size.
  *
  * Layout — a log-structured table, the same delta discipline as the
  * OSM middle's change ingest (reference parallel: the middle's
  * delete-insert semantics, src/middle-pgsql.cpp):
  *   - `path/snap/bucket=K/` — compacted (id, band) rows, hash-
  *     partitioned by band into a fixed bucket count (so a probe or a
  *     compaction touches partitions, never the whole table);
  *   - `path/log/gen=N/`   — one generation per append batch: rows
  *     (id, band, op) with op `a` (add, band real) or `d` (tombstone,
  *     band null — a delete needs no text);
  *   - `path/meta/`        — single row pinning the bucket count.
  *
  * Resolution semantics (delete-before-add within a batch): a
  * tombstone at generation G masks every snapshot row of that id and
  * every add with gen < G; adds with gen ≥ G are live — so one batch
  * that deletes and re-adds an id REPLACES it, and a later tombstone
  * kills the re-add. Appends must not add an id that is already live
  * (delete it in the same batch to replace — the standard
  * log-structured upsert contract).
  *
  * Scale: append writes only its batch (no read of existing state);
  * read resolves with one aggregate over tombstones (tiny — deletes)
  * and one join, both on the id key; compaction collects the DIRTY
  * BUCKET ids only (≤ bucket count, a bounded driver list), rewrites
  * exactly those partitions via dynamic partition overwrite, and
  * clears buckets that emptied — untouched bucket files are never
  * rewritten. */
object BandIndexStore {

  private def bucketed(idx: DataFrame, buckets: Int): DataFrame =
    idx.withColumn("bucket", pmod(xxhash64(col("band")), lit(buckets)))

  /** Initial snapshot build: band the corpus, hash-partition by band
    * bucket, one deterministically-sorted file per bucket. */
  def write(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    bucketed(Dedup.bandIndex(df, idCol, textCol), buckets)
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "id", "band")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/snap")
    Seq(buckets).toDF("buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def bucketCount(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").head().getInt(0)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logGens(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = new Path(s"$path/log")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong)
  }

  /** One maintenance batch: `adds` are banded now (while the text is
    * at hand — the tombstone path never needs it), `deleteIds` become
    * band-null tombstones, both land in the next log generation.
    * Writes ONLY the batch — never reads or rewrites existing
    * state. */
  def append(spark: SparkSession, path: String, adds: DataFrame,
      idCol: String, textCol: String, deleteIds: DataFrame): Unit = {
    val gen = logGens(spark, path).foldLeft(0L)(math.max) + 1L
    val a = Dedup.bandIndex(adds, idCol, textCol)
      .withColumn("op", lit("a"))
    val d = deleteIds.select(col(deleteIds.columns.head)
        .cast("long").as("id"))
      .withColumn("band", lit(null).cast("string"))
      .withColumn("op", lit("d"))
    a.unionByName(d).withColumn("gen", lit(gen))
      .repartition(1).sortWithinPartitions("op", "id", "band")
      .write.partitionBy("gen").mode("append").parquet(s"$path/log")
  }

  /** The current resolved index: snapshot plus log, tombstones
    * applied — exactly what [[Dedup.incrementalNearDupCandidates]]
    * should probe between compactions. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, path)
    val snapDir = new Path(s"$path/snap")
    // a fully-emptied snapshot has no bucket directories left — an
    // empty frame, not a schema-inference failure
    val snap =
      if (!f.exists(snapDir) || !f.listStatus(snapDir)
          .exists(_.getPath.getName.startsWith("bucket=")))
        Seq.empty[(Long, String)].toDF("id", "band")
      else spark.read.parquet(s"$path/snap")
        .select(col("id"), col("band"))
    if (logGens(spark, path).isEmpty) snap
    else {
      val log = spark.read.parquet(s"$path/log")
      val dels = log.where(col("op") === "d")
        .groupBy(col("id")).agg(max(col("gen")).as("dgen"))
      val liveAdds = log.where(col("op") === "a")
        .join(dels, Seq("id"), "left")
        .where(col("dgen").isNull || col("gen") >= col("dgen"))
        .select(col("id"), col("band"))
      snap.join(dels, Seq("id"), "left_anti").unionByName(liveAdds)
    }
  }

  /** Fold the log into the snapshot, rewriting ONLY dirty buckets:
    * buckets holding a tombstoned id's snapshot rows, plus buckets
    * receiving live adds. The dirty-bucket list is ≤ the fixed bucket
    * count (a bounded collect); clean bucket partitions are left
    * byte-untouched (spec'd), and dirty buckets that emptied are
    * dropped. Idempotent: with no log this is a no-op. */
  def compact(spark: SparkSession, path: String): Unit = {
    if (logGens(spark, path).isEmpty) return
    val buckets = bucketCount(spark, path)
    val snapB = spark.read.parquet(s"$path/snap")
      .select(col("id"), col("band"), col("bucket").cast("int"))
    val log = spark.read.parquet(s"$path/log")
    val dels = log.where(col("op") === "d")
      .groupBy(col("id")).agg(max(col("gen")).as("dgen"))
    val liveAdds = bucketed(
      log.where(col("op") === "a")
        .join(dels, Seq("id"), "left")
        .where(col("dgen").isNull || col("gen") >= col("dgen"))
        .select(col("id"), col("band")), buckets)
      .withColumn("bucket", col("bucket").cast("int"))
    val dirty = snapB.join(dels, Seq("id"), "left_semi")
      .select(col("bucket"))
      .union(liveAdds.select(col("bucket")))
      .distinct().collect().map(_.getInt(0)).toSet // ≤ bucket count
    val f = fs(spark, path)
    if (dirty.nonEmpty) {
      // the rewritten buckets go to a sibling directory first: the
      // rewrite plan READS path/snap, so overwriting it in place
      // would race the scan (Spark rejects the read-overwrite cycle);
      // the commit is then a per-dirty-bucket directory swap — a
      // metadata move, clean buckets byte-untouched
      val tmp = s"$path/snap_compact_tmp"
      snapB.where(col("bucket").isInCollection(dirty))
        .join(dels, Seq("id"), "left_anti")
        .unionByName(liveAdds)
        .repartition(math.max(dirty.size, 1), col("bucket"))
        .sortWithinPartitions("bucket", "id", "band")
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp)
      dirty.foreach { b =>
        f.delete(new Path(s"$path/snap/bucket=$b"), true)
        val src = new Path(s"$tmp/bucket=$b")
        // a dirty bucket whose rows all died writes no directory —
        // deleting the stale one above IS its compaction
        if (f.exists(src))
          f.rename(src, new Path(s"$path/snap/bucket=$b"))
      }
      f.delete(new Path(tmp), true)
    }
    f.delete(new Path(s"$path/log"), true)
  }
}
