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
  *   - `path/log/gen=N/bucket=K/` — one generation per append batch,
  *     hash-partitioned by the SAME band bucketing as the snapshot:
  *     rows (id, band, op) with op `a` (add, band real) or `d`
  *     (tombstone, band null — a delete needs no text; all
  *     tombstones share the null-hash bucket, and deletes are tiny);
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
  * Scale: append writes only its batch (no read of existing state),
  * fanned out across the bucket partitioning — a million-row re-crawl
  * batch writes in parallel, one deterministically-sorted file per
  * bucket. read resolves with one aggregate over tombstones (tiny —
  * deletes) and one join, both on the id key; compaction collects the
  * DIRTY BUCKET ids only (≤ bucket count, a bounded driver list),
  * rewrites exactly those partitions, and clears buckets that emptied
  * — untouched bucket files are never rewritten.
  *
  * Crash safety: the compaction rewrite lands in a sibling directory
  * first; a `_COMMIT` marker (written atomically via rename) is the
  * commit point. Every public entry calls [[recover]]: marker present
  * → roll the interrupted swap FORWARD (finish it — the rewrite is
  * durable); no marker → roll BACK (discard the sibling; the intact
  * log replays on the next compaction). No interleaving of crash and
  * restart can lose a bucket's live rows. Hadoop FS also signals
  * failures by RETURNING FALSE rather than throwing, so every
  * rename/delete on the commit path is checked ([[FsOps]]): a failed
  * swap aborts BEFORE the log or sibling is cleared, leaving the
  * marker + tmp in place for the next [[recover]] to retry — the
  * protocol never converts a false return into silent row loss.
  *
  * Filesystem contract: the commit point is an ATOMIC directory
  * rename — true on HDFS and local filesystems, NOT on object stores
  * (S3A/GCS emulate rename as copy+delete, so a half-copied marker or
  * bucket swap is observable mid-flight). On an object store, front
  * this layout with an HDFS-semantics layer (e.g. an HBoss/consistent
  * committer) or a table format that owns the commit protocol. */
object BandIndexStore {

  import FsOps.{deleteChecked, renameChecked}

  private def bucketed(idx: DataFrame, buckets: Int): DataFrame =
    idx.withColumn("bucket", pmod(xxhash64(col("band")), lit(buckets)))

  /** Initial snapshot build: band the corpus, hash-partition by band
    * bucket, one deterministically-sorted file per bucket. */
  def write(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit =
    writeBands(Dedup.bandIndex(df, idCol, textCol), path, buckets)

  /** The banding-agnostic snapshot build: `bands` is any (id LONG,
    * band STRING) frame — minhash bands ([[write]]), Hamming
    * fingerprint bands ([[Dedup.hammingBands]]), or any other LSH
    * family. The whole lifecycle (log generations, tombstones,
    * dirty-bucket compaction, crash recovery) is banding-agnostic by
    * construction; only the band-key producer differs. */
  def writeBands(bands: DataFrame, path: String,
      buckets: Int = 64): Unit = {
    val spark = bands.sparkSession
    import spark.implicits._
    bucketed(bands, buckets)
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "id", "band")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/snap")
    Seq(buckets).toDF("buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
    // band-frequency statistics (see readHotBands): aggregated from
    // the JUST-WRITTEN snapshot, not from `bands` — re-evaluating the
    // caller's frame would re-run an arbitrarily expensive upstream
    // banding a second time
    writeSnapStats(spark, path)
  }

  /** Aggregate band frequencies of the CURRENT snapshot into the
    * stats sidecar: `stats/snap` holds (band, n) for bands over
    * [[StatsFloor]]; the `stats/_floor` text records the floor and
    * the sidecar's row count — driver-readable with no Spark job, so
    * the overwhelmingly common "no hot bands, no appends" probe
    * answers job-free. */
  private def writeSnapStats(spark: SparkSession, path: String): Unit = {
    // snapFrame, not a raw read: a fully-emptied snapshot has no
    // bucket directories and a raw read would fail schema inference
    snapFrame(spark, path)
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
      .where(col("n") > StatsFloor)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/stats/snap")
    val nHot = spark.read.parquet(s"$path/stats/snap").count()
    VersionedStore.writeText(spark, s"$path/stats/_floor",
      s"$StatsFloor\n$nHot")
  }

  /** Bands with fewer rows than this never enter the stats sidecar —
    * it stays tiny (≤ rows/floor entries) at any index size. Recorded
    * in stats/meta so [[readHotBands]] can refuse a probe threshold
    * the stats cannot answer. */
  val StatsFloor: Long = 1024L

  /** The hot-band set a probe with `maxBandDf` would compute by
    * aggregating the full index — answered from the write-time stats
    * sidecar instead, so a planet-scale batch probe stops paying an
    * O(index) scan per batch. None when the store predates stats or
    * `maxBandDf` is below the recorded floor (callers fall back to
    * the aggregate). Counts are summed over snapshot + append
    * generations WITHOUT tombstone subtraction, and per-generation
    * counts below the floor are dropped — the set is therefore an
    * approximation of the live-count answer in both directions; that
    * only shifts bands between the hot and cold routes, which are
    * result-identical by construction (both are exact over disjoint
    * index partitions). */
  def readHotBands(spark: SparkSession, path: String,
      maxBandDf: Long): Option[Seq[String]] = {
    val f = fs(spark, path)
    try {
      val (floor, nSnapHot) = VersionedStore
        .readTextIfExists(spark, s"$path/stats/_floor") match {
        case Some(t) =>
          val parts = t.trim.split("\n")
          (parts(0).trim.toLong, parts(1).trim.toLong)
        case None => return None // store predates stats
      }
      if (maxBandDf < floor) return None
      val gens = logGens(spark, path)
        .map(g => s"$path/stats/gen=$g")
        .filter(p => f.exists(new Path(p)))
      // the common shape — an empty sidecar and no appends — answers
      // with no Spark job at all
      if (nSnapHot == 0L && gens.isEmpty) return Some(Seq.empty)
      val all = (s"$path/stats/snap" +: gens)
        .map(spark.read.parquet(_))
        .reduce(_ unionByName _)
      Some(all.groupBy(col("band")).agg(sum(col("n")).as("n"))
        .where(col("n") > maxBandDf)
        .collect().map(_.getString(0)).toSeq)
    } catch {
      // stats are an advisory sidecar: any torn/unreadable state is
      // answered by the full-aggregate fallback, never an error
      case scala.util.control.NonFatal(_) => None
    }
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

  /** The snapshot as a frame, empty-state safe: a fully-emptied
    * snapshot has no bucket directories left — an empty frame, not a
    * schema-inference failure (read AND compact both hit this state
    * after a compaction that drops every bucket). */
  private def snapFrame(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, path)
    val snapDir = new Path(s"$path/snap")
    if (!f.exists(snapDir) || !f.listStatus(snapDir)
        .exists(_.getPath.getName.startsWith("bucket=")))
      Seq.empty[(Long, String, Int)].toDF("id", "band", "bucket")
    else spark.read.parquet(s"$path/snap")
      .select(col("id"), col("band"), col("bucket").cast("int"))
  }

  /** One maintenance batch: `adds` are banded now (while the text is
    * at hand — the tombstone path never needs it), `deleteIds` become
    * band-null tombstones, both land in the next log generation,
    * hash-partitioned by the snapshot's band bucketing so the write
    * parallelizes across the batch — never a single-task funnel.
    * Writes ONLY the batch — never reads or rewrites existing
    * state. */
  def append(spark: SparkSession, path: String, adds: DataFrame,
      idCol: String, textCol: String, deleteIds: DataFrame): Unit =
    appendBands(spark, path, Dedup.bandIndex(adds, idCol, textCol),
      deleteIds)

  /** Banding-agnostic maintenance batch — see [[writeBands]];
    * `addBands` is the batch already banded (id, band). */
  def appendBands(spark: SparkSession, path: String,
      addBands: DataFrame, deleteIds: DataFrame): Unit = {
    recover(spark, path)
    val gen = logGens(spark, path).foldLeft(0L)(math.max) + 1L
    val buckets = bucketCount(spark, path)
    val a = addBands.withColumn("op", lit("a"))
    val d = deleteIds.select(col(deleteIds.columns.head)
        .cast("long").as("id"))
      .withColumn("band", lit(null).cast("string"))
      .withColumn("op", lit("d"))
    // adds bucket by band (the snapshot's key); tombstones carry a
    // null band (xxhash64(null) = seed = ONE bucket), so they bucket
    // by id instead — a planet-scale delete generation spreads across
    // all buckets rather than funneling into a single write task.
    // Safe: resolution and compaction key tombstones by id, never by
    // their log bucket (spec'd: multi-bucket delete gen, same view).
    a.unionByName(d)
      .withColumn("bucket",
        when(col("op") === "d", pmod(xxhash64(col("id")), lit(buckets)))
          .otherwise(pmod(xxhash64(col("band")), lit(buckets))))
      .withColumn("gen", lit(gen))
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "op", "id", "band")
      .write.partitionBy("gen", "bucket").mode("append")
      .parquet(s"$path/log")
    // per-generation stats sidecar (see readHotBands) — aggregated
    // from the just-written generation; skipped entirely on a store
    // that predates stats (keeps readHotBands' None contract)
    if (fs(spark, path).exists(new Path(s"$path/stats/_floor")))
      spark.read.parquet(s"$path/log/gen=$gen")
        .where(col("op") === "a")
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .where(col("n") > StatsFloor)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/stats/gen=$gen")
  }

  /** The current resolved index: snapshot plus log, tombstones
    * applied — exactly what [[Dedup.incrementalNearDupCandidates]]
    * should probe between compactions. */
  def read(spark: SparkSession, path: String): DataFrame = {
    recover(spark, path)
    val snap = snapFrame(spark, path).select(col("id"), col("band"))
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

  private def tmpDir(path: String) = s"$path/snap_compact_tmp"

  /** Heal an interrupted compaction. `_COMMIT` marker present: the
    * rewrite is complete and durable — roll FORWARD (redo the
    * idempotent bucket swaps/drops, drop the log, clear the sibling).
    * Sibling present without a marker: the rewrite never committed —
    * roll BACK (discard it; the untouched log replays next time). */
  private def recover(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(tmpDir(path))
    if (!f.exists(tmp)) return
    val marker = new Path(s"${tmpDir(path)}/_COMMIT")
    if (!f.exists(marker)) { deleteChecked(f, tmp); return }
    val in = f.open(marker)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(swapLine, dropLine) = txt.split("\n", -1).padTo(2, "")
    def ids(s: String) =
      s.split(",").filter(_.nonEmpty).map(_.toInt).toSeq
    applySwaps(spark, path, ids(swapLine), ids(dropLine))
    deleteChecked(f, new Path(s"$path/log"))
    deleteChecked(f, tmp)
  }

  /** Idempotent commit application: dropped buckets are deleted (a
    * re-delete is a no-op); swapped buckets are replaced only while
    * their rewritten sibling still exists (after the rename, the
    * snapshot already holds the new data and is left alone). */
  private def applySwaps(spark: SparkSession, path: String,
      swap: Seq[Int], drop: Seq[Int]): Unit = {
    val f = fs(spark, path)
    drop.foreach(b =>
      deleteChecked(f, new Path(s"$path/snap/bucket=$b")))
    swap.foreach { b =>
      val src = new Path(s"${tmpDir(path)}/bucket=$b")
      if (f.exists(src)) {
        // checked: an unchecked false rename after the destination
        // delete is exactly the permanent-loss window the _COMMIT
        // protocol exists to close — abort and let recover retry
        deleteChecked(f, new Path(s"$path/snap/bucket=$b"))
        renameChecked(f, src, new Path(s"$path/snap/bucket=$b"))
      }
    }
  }

  /** Fold the log into the snapshot, rewriting ONLY dirty buckets:
    * buckets holding a tombstoned id's snapshot rows, plus buckets
    * receiving live adds. The dirty-bucket list is ≤ the fixed bucket
    * count (a bounded collect); clean bucket partitions are left
    * byte-untouched (spec'd), and dirty buckets that emptied are
    * dropped. Idempotent: with no log this is a no-op. */
  def compact(spark: SparkSession, path: String): Unit =
    compactWithFailpoint(spark, path, failpoint = 0)

  /** Test seam: `failpoint` 1 aborts after the rewrite but BEFORE the
    * commit marker (recovery must roll back); 2 aborts AFTER the
    * marker but before any swap (recovery must roll forward). 0 is
    * the production path. */
  private[graft] def compactWithFailpoint(spark: SparkSession,
      path: String, failpoint: Int): Unit = {
    recover(spark, path)
    if (logGens(spark, path).isEmpty) return
    val buckets = bucketCount(spark, path)
    val snapB = snapFrame(spark, path)
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
      val tmp = tmpDir(path)
      snapB.where(col("bucket").isInCollection(dirty))
        .join(dels, Seq("id"), "left_anti")
        .unionByName(liveAdds)
        .repartition(math.max(dirty.size, 1), col("bucket"))
        .sortWithinPartitions("bucket", "id", "band")
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp)
      if (failpoint == 1) sys.error("failpoint 1: before commit marker")
      // a dirty bucket whose rows all died writes no directory —
      // deleting the stale one IS its compaction ("drop"); the rest
      // swap. Record the split in the marker so roll-forward is
      // unambiguous (a missing sibling then always means "already
      // swapped", never "dropped").
      val written = f.listStatus(new Path(tmp))
        .map(_.getPath.getName).filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toInt).toSet
      val swap = dirty.toSeq.filter(written).sorted
      val drop = dirty.toSeq.filterNot(written).sorted
      // COMMIT POINT — the marker lands via atomic rename, so a
      // half-written marker is never observable
      val markerTmp = new Path(s"$tmp/_COMMIT.inprogress")
      val out = f.create(markerTmp, true)
      try out.write(
        (swap.mkString(",") + "\n" + drop.mkString(","))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      renameChecked(f, markerTmp, new Path(s"$tmp/_COMMIT"))
      if (failpoint == 2) sys.error("failpoint 2: after commit marker")
      applySwaps(spark, path, swap, drop)
      deleteChecked(f, new Path(s"$path/log"))
      deleteChecked(f, new Path(tmp))
    } else deleteChecked(f, new Path(s"$path/log"))
    refreshStats(spark, path)
  }

  /** Rebuild the snapshot stats sidecar and drop per-generation stats
    * after a compaction folded the log away. Advisory only (see
    * readHotBands): a crash between the compaction commit and this
    * refresh merely leaves an under-counting sidecar until the next
    * maintenance pass — stale generation stats can never be read,
    * because readHotBands only consults generations still present in
    * the log. */
  private def refreshStats(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    if (!f.exists(new Path(s"$path/stats/_floor"))) return
    f.listStatus(new Path(s"$path/stats")).toSeq
      .map(_.getPath).filter(_.getName.startsWith("gen="))
      .foreach(p => deleteChecked(f, p))
    writeSnapStats(spark, path)
  }
}
