package graft.operators


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Persisted IVF index — the vector-side sibling of
  * [[BandIndexStore]]: a production similarity-search pipeline trains
  * the coarse quantizer once, assigns the corpus once, and then
  * serves probe batches against the stored cells without ever
  * re-scanning the corpus. [[Similarity.ivfTopK]] is the in-plan
  * form; this persists its two artifacts, under a VERSIONED layout:
  *   - `path/v=N/centroids` — the capped deterministic centroid
  *     sample (id % centroidEvery == 0, lowest `centroidCap` ids),
  *     quantized vectors + norms, ≤ centroidCap rows;
  *   - `path/v=N/cells/cell=K/` — every corpus vector (id, quantized
  *     vector, norm) under its argmax-cosine cell, one directory per
  *     Voronoi cell;
  *   - `path/v=N/_COMMITTED` — the commit marker, created by atomic
  *     rename AFTER both artifacts are fully written.
  *
  * Crash safety: a reader resolves the HIGHEST version carrying the
  * marker, so an interrupted [[write]] (torn cells, half the
  * centroids) is simply invisible — the probe sees the previous
  * complete index or the new complete one, never a torn cell set.
  * The next successful write garbage-collects superseded and torn
  * versions. Same atomic-rename filesystem contract as
  * [[BandIndexStore]] (HDFS/local yes, object stores no — see
  * [[FsOps]]).
  *
  * Probe cost is the point: a batch of Q queries ranks cells against
  * the broadcast centroids, and the scan of the cells directory is
  * PARTITION-PRUNED to the ≤ Q·nprobe probed cell directories — at
  * 100 TB of vectors the probe reads ~nprobe/|C| of the index, and
  * the pruned-cell list is a bounded driver collect (≤ Q·nprobe ids,
  * same justified-bounded class as the ANN broadcast probe set).
  * Scores are the same quantized integer cosine as every ANN operator
  * here, so probe(write(corpus)) is bit-equal to the in-plan
  * [[Similarity.ivfTopK]] with the same parameters (spec'd). */
object IvfIndexStore {

  /** Shared ANN-store plumbing, package-visible for
    * [[IvfPqIndexStore]]: the quantized cosine of two stored
    * (vector, norm) pairs. */
  private[operators] val qcos =
    (v: Column, n1: Column, v2: Column, n2: Column) =>
      qdot(v, v2).cast("double") / (n1 * n2)

  /** The version a reader serves: the highest committed one
    * ([[VersionedStore]] protocol). */
  private[graft] def currentVersion(spark: SparkSession,
      path: String): Option[Long] =
    VersionedStore.currentVersion(spark, path)

  /** Train (deterministic sample) + assign + store. One corpus pass:
    * the assignment argmax is map-side combinable (one compact row
    * per vector before the shuffle), then one hash-partitioned write
    * by cell — SALTED by a hash of the vector id into `writeSplits`
    * shards per cell, so a hot Voronoi cell (real embedding
    * distributions are never uniform over cells) writes through
    * `writeSplits` parallel tasks instead of funneling into one.
    * Each (cell, salt) shard is one deterministically-sorted file;
    * readers only ever see the cell directory, so the salt is
    * invisible to [[probe]] (spec'd: skewed fixture → >1 file per hot
    * cell, probe bit-equal). */
  def write(corpus: DataFrame, path: String,
      centroidEvery: Int = 25, centroidCap: Int = 256,
      writeSplits: Int = 8): Unit =
    writeWithFailpoint(corpus, path, centroidEvery, centroidCap,
      writeSplits, failpoint = 0)

  /** Test seam: `failpoint` 1 aborts after the artifacts are written
    * but BEFORE the commit marker (the version must stay invisible);
    * 2 aborts AFTER the marker but before superseded versions are
    * cleaned (the new version must serve; cleanup resumes on the next
    * write). 0 is the production path. */
  private[graft] def writeWithFailpoint(corpus: DataFrame, path: String,
      centroidEvery: Int, centroidCap: Int, writeSplits: Int,
      failpoint: Int): Unit = {
    val spark = corpus.sparkSession
    require(corpus.isEmpty ||
      !corpus.where(col("id") % centroidEvery === 0).isEmpty,
      s"IVF centroid sample is empty (no id % $centroidEvery == 0 rows)")
    val (current, next) = VersionedStore.prepareStage(spark, path)
    val vdir = s"$path/v=$next"

    val cent = broadcast(corpus
      .where(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), quantize(col("vec")).as("cv"))
      .orderBy(col("cid")).limit(centroidCap)
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double"))))
    val corp = corpus.select(col("id").as("nid"),
        quantize(col("vec")).as("nv"))
      .withColumn("nn", sqrt(qdot(col("nv"), col("nv")).cast("double")))
    // argmax-by-struct, like ivfTopK: collapses the |corpus|×|C|
    // broadcast expansion to one row per vector before any shuffle
    val assigned = corp.crossJoin(cent)
      .select(col("nid"), col("nv"), col("nn"),
        struct(qcos(col("nv"), col("nn"), col("cv"), col("cn")).as("c"),
          (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("nv")).as("nv"), first(col("nn")).as("nn"),
        max(col("sc")).as("m"))
      .select(col("nid"), col("nv"), col("nn"),
        (-col("m.nc")).as("cell"))
    assigned
      .withColumn("salt", pmod(xxhash64(col("nid")), lit(writeSplits)))
      .repartition(col("cell"), col("salt"))
      .sortWithinPartitions("cell", "nid")
      .drop("salt")
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$vdir/cells")
    cent.select(col("cid"), col("cv"), col("cn"))
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/centroids")
    if (failpoint == 1) sys.error("failpoint 1: before commit marker")
    VersionedStore.commitMarker(spark, vdir)
    if (failpoint == 2) sys.error("failpoint 2: after commit marker")
    VersionedStore.gcPrevious(spark, path, current)
  }

  /** Serve a probe batch: rank the broadcast centroids per query,
    * read ONLY the probed cell partitions of the current committed
    * version, exact quantized cosine within them, top-k with
    * deterministic tie-breaks. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    probeCandidates(spark, path, queries, nprobe)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Incremental SEMANTIC dedup against the persisted index — the
    * SemDeDup keep/drop decision applied to a NEW batch vs the
    * existing corpus without touching corpus vectors outside the
    * probed cells (the crawl-ingest shape: embeddings of the new
    * batch arrive, the corpus index is already on disk): each batch
    * vector keeps iff its nearest indexed neighbor within `nprobe`
    * probed cells has quantized cosine < `threshold`. Returns one row
    * per batch vector: (id, nearest_id, cos, kept) — nearest_id/cos
    * null when the probed cells held no candidate at all (kept).
    *
    * Same recall trade-off as [[graft.operators.Dedup.semanticDedup]]
    * (a twin assigned to an unprobed cell is missed — the documented
    * SemDeDup contract); everything read is partition-pruned to the
    * probed cells. */
  def dedupProbe(spark: SparkSession, path: String, batch: DataFrame,
      threshold: Double, nprobe: Int = 2): DataFrame = {
    val best = probe(spark, path, batch, k = 1, nprobe)
      .select(col("qid"), col("nid"), col("cos"))
    batch.select(col("id")).join(best, col("id") === col("qid"), "left")
      .select(col("id"), col("nid").as("nearest_id"), col("cos"),
        (col("cos").isNull || col("cos") < threshold).as("kept"))
  }

  /** The unranked probe stage: every (query, candidate) pair in the
    * probed cells with its exact quantized cosine — shared by
    * [[probe]] (ranks it) and [[IvfPqIndexStore.probeRerank]] (semi-
    * joins the ADC shortlist FIRST, so the ranking window never sees
    * the unshortlisted candidates). */
  private[operators] def probeCandidates(spark: SparkSession,
      path: String, queries: DataFrame, nprobe: Int): DataFrame = {
    val vdir = VersionedStore.servingDir(spark, path, "IvfIndexStore")
    val cent = broadcast(spark.read.parquet(s"$vdir/centroids"))
    val q = broadcast(queries.select(col("id").as("qid"),
        quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double"))))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    // materialized once (≤ |queries| · nprobe rows): the pruning
    // collect below and the cells join would otherwise each re-run
    // the crossJoin + ranking window. Deliberately EAGER: a lazy pin
    // was A/B-measured in round 16 (family MiniBench 12.0 s lazy vs
    // 11.6 s eager, full-bench pair −7..16% on all 7 probe queries)
    // — the barrier job is ~ms on the tiny probe set while the lazy
    // finalization path costs more than it saves here.
    val probes = q.crossJoin(cent)
      .select(col("qid"), col("qv"), col("qn"), col("cid"),
        qcos(col("qv"), col("qn"), col("cv"), col("cn")).as("pcos"))
      .withColumn("prank", row_number().over(pw))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
      .localCheckpoint()
    // bounded driver list (≤ |queries| · nprobe): the literal IN
    // filter is what turns the cells read into partition pruning —
    // only the probed cell=K directories are listed and scanned
    val probedCells = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0))
    // probed partition dirs handed to the reader directly — the
    // whole-dir read re-listed every cell partition per probe (a
    // distributed listing job past 32 cells); see
    // VersionedStore.readProbedCells
    val cells = VersionedStore
      .readProbedCells(spark, s"$vdir/cells", probedCells)
      .getOrElse(spark.read.parquet(s"$vdir/cells")
        .where(col("cell").cast("long").isInCollection(probedCells)))
      .select(col("nid"), col("nv"), col("nn"),
        col("cell").cast("long").as("cell"))
    // explicit hint: the checkpointed probe set is the same bounded
    // ≤ |queries| · nprobe class as the broadcast query set above,
    // and a checkpoint scan carries no size statistics for the
    // planner to pick the broadcast itself
    broadcast(probes).join(cells, probes("cid") === cells("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        qcos(col("qv"), col("qn"), col("nv"), col("nn")).as("cos"))
  }
}
