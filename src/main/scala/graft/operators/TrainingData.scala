package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation job: every stage is one of the
  * individually oracle-checked operators, composed into a single
  * declarative plan — the proof that the operator library chains into
  * the pipeline a pre-training data team actually runs.
  *
  *   quality funnel → exact dedup → near-dup prune (LSH → Jaccard →
  *   connected components, keep lowest id) → benchmark
  *   decontamination → per-source quota mix → sequence packing
  *
  * Everything is joins/aggregates over the input; no stage collects
  * to the driver, every near-dup step is fan-out-bounded (bands,
  * capped postings), and the whole chain inherits each operator's
  * scale shape. Stage survivor counts come from one `curateCounts`
  * pass (separate actions — cheap next to the pipeline itself).
  */
object TrainingData {

  /** Returns the curated corpus: (id, source, text, token count,
    * shard-local packing offsets). Deterministic end to end.
    *
    * `persistStages` materializes each stage's survivor set
    * (MEMORY_AND_DISK): the chain references q1/q2-style frames more
    * than once (keep-join + anti-join), and without persistence
    * Catalyst recomputes the shared subplan per reference — noise at
    * test scale, a full extra corpus pass each at 100 TB. Results are
    * identical either way (the gate runs with it off).
    *
    * `onStagePersist` receives each frame the moment it is persisted;
    * long-lived sessions MUST collect these and unpersist them after
    * the terminal action, or repeated curate() calls leak cached
    * blocks until the context dies. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, charsCol: String,
      benchmark: DataFrame, benchTextCol: String,
      quota: Map[String, Int], defaultQuota: Int,
      windowTokens: Int = 2048, minJaccard: Double = 0.8,
      persistStages: Boolean = false,
      onStagePersist: DataFrame => Unit = _ => ()): DataFrame = {
    val stage = (df: DataFrame) =>
      if (persistStages) {
        val p =
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        onStagePersist(p)
        p
      } else df
    // 1. quality funnel: keep rows passing all four integer stages
    val funnel = TextAnalysis.funnelStages(docs, textCol, charsCol)
    val quality = stage(funnel.where(col("__s4"))
      .select(docs.columns.map(col).toIndexedSeq: _*))
    // 2. exact dedup: keep the lowest id per content digest — one
    //    window pass (single shuffle on the digest) instead of
    //    Dedup.exact + join-back, which scans the quality lineage
    //    twice when stages aren't persisted; survivors are identical
    //    (lowest id per md5(text))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol)))
    val exactKept = stage(quality
      .withColumn("__keep", min(col(idCol)).over(wd))
      .where(col(idCol) === col("__keep")).drop("__keep"))
    // 3. near-dup prune: cluster LSH-verified pairs, keep each
    //    cluster's lowest id (docs in no cluster survive untouched)
    val clusters = Dedup.nearDupClusters(exactKept, idCol, textCol,
      minJaccard)
    val dropNear = clusters
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("keep"))
      .join(clusters, "cluster_id")
      .where(col("doc_id") =!= col("keep"))
      .select(col("doc_id").as(idCol))
    val nearKept = stage(exactKept.join(dropNear, Seq(idCol), "left_anti"))
    // 4. decontamination: drop docs sharing any 8-gram with the
    //    benchmark
    val contaminated = TextAnalysis.decontaminate(nearKept, idCol,
      textCol, benchmark, benchTextCol).select(col(idCol))
    val clean = nearKept.join(contaminated, Seq(idCol), "left_anti")
    // 5. deterministic source mixing
    val mixed = Sampling.sourceMix(clean, srcCol, idCol, quota,
      defaultQuota).drop("rk")
    // 6. sequence packing per source shard
    val withTokens = mixed.withColumn("n_tokens",
      size(graft.functions.TextFunctions.normToks(col(textCol))))
    Sampling.packSequences(withTokens, srcCol, idCol, "n_tokens",
      windowTokens)
  }

  /** Survivor count per stage — the funnel report a curation run
    * ships with. Runs the same plans with count actions. */
  def curateCounts(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, charsCol: String,
      benchmark: DataFrame, benchTextCol: String,
      quota: Map[String, Int], defaultQuota: Int,
      minJaccard: Double = 0.8): Seq[(String, Long)] = {
    val funnel = TextAnalysis.funnelStages(docs, textCol, charsCol)
    val quality = funnel.where(col("__s4"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol)))
    val exactKept = quality
      .withColumn("__keep", min(col(idCol)).over(wd))
      .where(col(idCol) === col("__keep")).drop("__keep")
    val clusters = Dedup.nearDupClusters(exactKept, idCol, textCol,
      minJaccard)
    val dropNear = clusters
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("keep"))
      .join(clusters, "cluster_id")
      .where(col("doc_id") =!= col("keep"))
      .select(col("doc_id").as(idCol))
    val nearKept = exactKept.join(dropNear, Seq(idCol), "left_anti")
    val contaminated = TextAnalysis.decontaminate(nearKept, idCol,
      textCol, benchmark, benchTextCol).select(col(idCol))
    val clean = nearKept.join(contaminated, Seq(idCol), "left_anti")
    val mixed = Sampling.sourceMix(clean, srcCol, idCol, quota,
      defaultQuota)
    Seq(
      "input" -> docs.count(),
      "quality" -> quality.count(),
      "exact_dedup" -> exactKept.count(),
      "near_dedup" -> nearKept.count(),
      "decontaminated" -> clean.count(),
      "mixed" -> mixed.count())
  }

  /** Deterministic shard export — the artifact-producing end of the
    * pipeline: [[Sampling.shardAssign]] fixes (shard, pos) for every
    * document, rows land under `outDir/data/shard=K/` sorted by pos
    * within each shard file, and `outDir/manifest/` records per shard
    * the document count, byte count, and a content digest (md5 over
    * the per-doc text digests in pos order). Re-running the export on
    * the same corpus yields byte-identical shard contents and an
    * identical manifest — what makes a 100 TB export restartable and
    * auditable (a trainer can verify a shard against the manifest
    * before reading it).
    *
    * Scale: one shuffle on the shard key (the assign), one
    * repartition-by-shard write with an in-partition sort, and a
    * per-shard aggregate for the manifest; nothing touches the
    * driver. Pick nShards ≫ executors — trainers want many small
    * shards anyway. Returns the manifest frame. */
  def exportShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): DataFrame = {
    val assigned = Sampling.shardAssign(docs, idCol, nShards)
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(s"$outDir/data")
    val manifest = assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        md5(concat_ws("",
          sort_array(collect_list(struct(col("pos"),
            md5(col(textCol)).as("h")))).getField("h")))
          .as("content_digest"))
    manifest.coalesce(1).write.mode("overwrite")
      .json(s"$outDir/manifest")
    manifest
  }

  /** Per-domain curriculum ordering — the step between shard
    * assignment and a trainer: fix, for every document, a
    * deterministic position in its shard's within-epoch read order
    * such that (a) higher-quality documents come first (quality
    * curriculum), (b) the sources/domains INTERLEAVE instead of
    * arriving in blocks (a trainer reading positions sequentially
    * sees the mix at every step, not "all web, then all code"), and
    * (c) the order is a pure function of document content/ids —
    * re-runs, retries, and any cluster size reproduce it
    * byte-identically.
    *
    * Construction, all exact integer/string arithmetic:
    *   - shard    = first-8-hex md5(id) mod `nShards` (the
    *                [[Sampling.shardAssign]] key, so this composes
    *                with the export layout);
    *   - q_bucket = least((`qBuckets` · n_uniq) div max(n_tok, 1),
    *                `qBuckets`−1) — the unique-token share as an
    *                integer-division quantile, the repo's exact
    *                stand-in for a model quality score (swap the
    *                expression, keep the ordering contract);
    *   - src_rank = rank of the doc within (shard, q_bucket, source)
    *                by (md5(id), id) — a reproducible uniform shuffle
    *                per domain;
    *   - pos      = row_number within the shard by
    *                (q_bucket DESC, src_rank, md5(id), id).
    * Ordering by src_rank before the hash is what interleaves: rank-1
    * docs of EVERY source precede every rank-2 doc, so a bucket's
    * stream cycles through the domains in md5-shuffled cohorts.
    *
    * Scale: two hash-partitioned windows (by (shard, q_bucket,
    * source), then by shard) — no global sort anywhere; parallelism =
    * nShards, exactly like the export it feeds. Epochs: vary the salt
    * (`epoch`) to reshuffle within buckets while keeping the
    * curriculum shape — position is then a function of (content,
    * epoch), still deterministic. */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, nShards: Int, qBuckets: Int = 4,
      epoch: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws("|", lit(epoch.toString),
      col(idCol).cast("string")))
    val w = graft.functions.TextFunctions.normToks(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"),
        col(srcCol).as("source"), h.as("h"),
        size(w).cast("long").as("n_tok"),
        size(array_distinct(w)).cast("long").as("n_uniq"))
      .withColumn("shard",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long"), lit(nShards)))
      .withColumn("q_bucket", least(
        expr(s"($qBuckets * n_uniq) div greatest(n_tok, 1)"),
        lit(qBuckets - 1L)))
    val perSrc = Window.partitionBy(col("shard"), col("q_bucket"),
      col("source")).orderBy(col("h"), col("doc_id"))
    val perShard = Window.partitionBy(col("shard"))
      .orderBy(col("q_bucket").desc, col("src_rank"), col("h"),
        col("doc_id"))
    base
      .withColumn("src_rank", row_number().over(perSrc).cast("long"))
      .withColumn("pos", row_number().over(perShard).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"),
        col("q_bucket"), col("src_rank"), col("pos"))
  }

  /** Verify an exported shard directory against its manifest: recount
    * and re-digest every shard from the data files and compare. Any
    * mismatch (missing rows, reordered rows, corrupted text) surfaces
    * as a row with ok=false. One scan + one per-shard aggregate. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
      textCol: String, outDir: String): DataFrame = {
    val data = spark.read.parquet(s"$outDir/data")
    val recomputed = data.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs2"),
        sum(length(col(textCol)).cast("long")).as("n_chars2"),
        md5(concat_ws("",
          sort_array(collect_list(struct(col("pos"),
            md5(col(textCol)).as("h")))).getField("h")))
          .as("digest2"))
    val manifest = spark.read.json(s"$outDir/manifest")
    manifest.join(recomputed, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs") === col("n_docs2") &&
          col("n_chars") === col("n_chars2") &&
          col("content_digest") === col("digest2"),
          lit(false)).as("ok")) // a shard missing on either side fails
  }
}
