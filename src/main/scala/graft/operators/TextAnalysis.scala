package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators: token statistics, quality scoring, and a
  * marker-word language classifier. All pure per-row projections +
  * one hash aggregate — nothing here shuffles more than the grouping
  * keys, so the plans scale linearly with corpus size.
  */
object TextAnalysis {

  /** Per-document token/quality metrics:
    * n_tokens, n_distinct, type-token ratio, mean token length, and a
    * boolean quality gate. All counts are exact integers; the two
    * ratios are single divisions of those integers (cross-engine
    * deterministic).
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = normToks(col(textCol))
    val nTok = size(w)
    val nUniq = size(array_distinct(w))
    val sumLen = aggregate(transform(w, t => length(t)), lit(0), _ + _)
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      nUniq.as("n_distinct"),
      (nUniq.cast("double") / nTok.cast("double")).as("ttr"),
      (sumLen.cast("double") / nTok.cast("double")).as("mean_tok_len"),
      (nTok >= 5 && nTok <= 10000 &&
        (nUniq.cast("double") / nTok.cast("double")) > 0.3).as("quality_ok"))
  }

  /** Marker-word language ID: deterministic argmax over per-family
    * marker-occurrence counts (n-gram-frequency classification reduced
    * to its SQL-expressible core; ties resolve in declaration order).
    * Returns (id, <one count column per family>, predicted).
    */
  val markerFamilies: Seq[(String, Seq[String])] = Seq(
    "common" -> Seq("the", "data", "value", "line"),
    "db"     -> Seq("query", "join", "scan", "hash", "sort", "merge"),
    "spark"  -> Seq("spark", "stream", "batch", "shuffle", "partition"))

  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = normToks(col(textCol))
    // all marker words counted in ONE pass over the token array
    // (graft.expressions.WordCountsExpr); the family count is a scalar
    // sum of that array's slots
    val allWords = markerFamilies.flatMap(_._2)
    val famOffsets = markerFamilies.scanLeft(0)(_ + _._2.size)
    val passThrough = df.columns.filter(_ != textCol).map(col).toSeq
    // materialize the count array once; the per-family sums reference
    // its slots (CollapseProject keeps the non-cheap kernel un-inlined)
    val withCnt = df.select(passThrough :+
      graft.expressions.VectorExpressions.wordCountsN(w, allWords).as("_mc"): _*)
    val counts: Seq[(String, Column)] =
      markerFamilies.zipWithIndex.map { case ((fam, words), f) =>
        fam -> words.indices
          .map(i => col("_mc")(famOffsets(f) + i))
          .reduce(_ + _)
      }
    val withCounts = withCnt.select(
      passThrough ++ counts.map { case (f, c) => c.as(s"c_$f") }: _*)
    // argmax in declaration order: first family ≥ all later ones wins
    val predicted = counts.indices.init.foldRight(
      lit(counts.last._1): Column) { (i, elseCol) =>
      val geAllLater = counts.drop(i + 1)
        .map(later => col(s"c_${counts(i)._1}") >= col(s"c_${later._1}"))
        .reduce(_ && _)
      when(geAllLater, lit(counts(i)._1)).otherwise(elseCol)
    }
    withCounts.withColumn("predicted", predicted)
  }

  /** Corpus-level token statistics per group key. */
  def tokenStats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        (sum(tokenCount(col(textCol)).cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avg_tokens"))

  /** Exact rank-based quantiles of a per-document measure, per group —
    * corpus profiling that is reproducible across engines (approx
    * sketches like percentile_approx are not): the p-quantile is the
    * value at rank ceil(p·n) in (measure, id) order, the "nearest-rank"
    * definition, so every reported number is an actual corpus value.
    *
    * Scale: one shuffle on the group key; each group ranks
    * independently (a planet-sized single group serializes its sort —
    * shard such a group first, same note as tokenBudget). */
  def exactQuantiles(df: DataFrame, groupCol: String, idCol: String,
      measure: Column, quantiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__m").asc, col(idCol).asc)
    val n = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(idCol),
        measure.cast("long").as("__m"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
    val agg = quantiles.map(q =>
      max(when(col("__rk") === ceil(lit(q) * col("__n") / 100.0), col("__m")))
        .as(s"p$q"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_docs"), agg: _*)
  }

  /** BPE-ish token counting: the whitespace split of [[tokenStats]] is
    * one estimator; this is the other — a GPT-2-shaped pre-tokenizer
    * regex (letter runs | digit runs | single other non-space char),
    * the standard first stage before BPE merges. Per group: total
    * subword-ish tokens, the letter/digit/punct breakdown, and tokens
    * per document. regexp_extract_all is codegen'd, the aggregate is
    * map-side combinable — a pure scan + tiny hash agg at any scale. */
  def bpeTokenStats(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val lowered = lower(col(textCol))
    // explicit whitespace class, NOT \s: Java's \s includes \x0B
    // (vertical tab) while RE2's does not — the oracle must agree
    val nBpe = size(regexp_extract_all(lowered,
      lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]"), lit(0))).cast("long")
    val nAlpha = size(regexp_extract_all(lowered, lit("[a-z]+"), lit(0)))
      .cast("long")
    val nNum = size(regexp_extract_all(lowered, lit("[0-9]+"), lit(0)))
      .cast("long")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nBpe).as("total_bpe"),
        sum(nAlpha).as("total_alpha"),
        sum(nNum).as("total_num"),
        (sum(nBpe) - sum(nAlpha) - sum(nNum)).as("total_punct"),
        (sum(nBpe).cast("double") / count(lit(1)).cast("double"))
          .as("avg_bpe"))
  }

  /** Iterative BPE merge TRAINING — the actual tokenizer-training
    * loop, not just pre-tokenization stats: `rounds` times, count all
    * adjacent token pairs corpus-wide, pick the most frequent (ties
    * broken lexicographically), fuse every greedy left-to-right
    * occurrence into a new symbol (left+right joined with '+'), and
    * repeat on the fused corpus. Returns the learned merge table:
    * (round, lhs, rhs, merged, cnt).
    *
    * The fuse step runs as wrapped-string `replace`:
    * `[tok][tok]...` with `[l][r]` → `[l+r]` — literal replace scans
    * left-to-right non-overlapping in both Spark and the relational
    * oracle, which IS greedy BPE application, so the engines agree
    * bit for bit ('[', ']', '+' are asserted absent from the token
    * alphabet by the whitespace pre-tokenizer's callers).
    *
    * Scale: per round ONE map-side-combined pair-count aggregate
    * (shuffle bounded by distinct pairs), a 1-row driver collect, and
    * a map-only fuse; the fused corpus is persisted per round and the
    * previous round unpersisted (the same checkpoint discipline as the
    * connected-components loop), so lineage stays one round deep. */
  def bpeMerges(df: DataFrame, textCol: String,
      rounds: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val (merges, fin) = bpeLoop(
      df.select(lit(0L).as("__id"), normToks(col(textCol)).as("w")),
      rounds)
    fin.unpersist()
    import spark.implicits._
    merges.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** BPE merge APPLICATION — the other half of tokenizer training:
    * run the same `rounds` of learned merges over the corpus and
    * report per document the token count before and after fusing (the
    * compression the learned vocabulary buys on its own training
    * corpus). Same loop, same exactness contract as [[bpeMerges]];
    * the per-doc report adds one map-only projection at the end. */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
      rounds: Int = 4): DataFrame = {
    val (_, fin) = bpeLoop(
      df.select(col(idCol).cast("long").as("__id"),
        normToks(col(textCol)).as("w")),
      rounds)
    val out = fin.select(col("__id").as(idCol),
        col("__n0").as("n_before"),
        size(col("w")).cast("long").as("n_after"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    fin.unpersist()
    out
  }

  /** Scale-safe tokenizer training: learn the merges on a
    * DETERMINISTIC md5 sample of the corpus, then apply them
    * corpus-wide in ONE map pass — the path that survives a real
    * vocabulary. [[bpeMerges]] is exact but driver-paced: each merge
    * round is a full-corpus pair-count aggregate, so 32k merges means
    * 32k sequential corpus scans — O(vocab × corpus) wall. Here the
    * per-round aggregate runs over the sampled docs only (cacheable,
    * size set by `hexThreshold` — the 2-hex-char prefix compare
    * keeps 0x14/0x100 = 20/256 ≈ 7.8% at the default "14"), making
    * per-round cost independent of corpus size, and the application
    * is the codegen'd [[graft.expressions.BpeApplyExpr]] kernel: all
    * learned merges replayed greedily left-to-right inside one
    * whole-stage-codegen projection (1 corpus job total, not 1 per
    * round). Fuse semantics are bit-identical to the training loop's
    * literal replace, so sampled-trained merges applied to the sample
    * reproduce [[bpeApply]] on that sample exactly (spec'd).
    *
    * Returns per document (id, n_before, n_after) under the
    * sample-learned vocabulary — the compression report a tokenizer
    * hand-off needs. 32k-vocab wall estimate: rounds × (pair-agg over
    * the ~0.1-8% cached sample, each a few seconds on a cluster) for
    * training + ONE corpus-wide map pass for apply; the corpus term
    * no longer multiplies by the vocabulary size. */
  def bpeSampledCompression(df: DataFrame, idCol: String,
      textCol: String, rounds: Int = 4,
      hexThreshold: String = "40"): DataFrame = {
    val sampled = df.where(
      substring(md5(col(idCol).cast("string")), 1, 2) < lit(hexThreshold))
    val (merges, fin) = bpeLoop(
      sampled.select(col(idCol).cast("long").as("__id"),
        normToks(col(textCol)).as("w")),
      rounds)
    fin.unpersist()
    val w = normToks(col(textCol))
    df.select(col(idCol),
      size(w).cast("long").as("n_before"),
      size(graft.expressions.VectorExpressions.bpeApplyN(w,
        merges.map(_._2).toIndexedSeq, merges.map(_._3).toIndexedSeq))
        .cast("long").as("n_after"))
  }

  /** Shared training loop: returns the merge table and the final
    * fused corpus frame (persisted; columns __id, __n0, w — the
    * caller unpersists). */
  private def bpeLoop(ids: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    var toks = ids
      .withColumn("__n0", size(col("w")).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // parent frame still persisted until its CHILD materializes; the
    // next round's pair-count aggregate does that materialization for
    // free, so each round runs ONE job (aggregate) instead of two
    // (aggregate + count)
    var pending: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    while (r <= rounds) {
      val top = toks
        .select(explode(graft.expressions.VectorExpressions
          .shinglesN(col("w"), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      // the aggregate just materialized `toks` — its parent's blocks
      // are no longer reachable from any live plan
      pending.foreach(_.unpersist())
      pending = None
      if (top.isEmpty) r = rounds // corpus degenerated to 1-token docs
      else {
        val pair = top.head.getString(0); val cnt = top.head.getLong(1)
        val Array(l, rt) = pair.split(" ", 2)
        merges += ((r, l, rt, s"$l+$rt", cnt))
        // fuse: wrapped-string literal replace (left-to-right,
        // non-overlapping — greedy BPE application), then unwrap
        val wrapped = concat(lit("["), concat_ws("][", col("w")), lit("]"))
        val fused = call_function("replace", wrapped,
          lit(s"[$l][$rt]"), lit(s"[$l+$rt]"))
        val unwrapped = split(expr(
          "substring(__fused, 2, length(__fused) - 2)"), "\\]\\[", -1)
        val next = toks
          .withColumn("__fused", fused)
          .select(col("__id"), col("__n0"),
            when(size(col("w")) === 0, col("w"))
              .otherwise(unwrapped).as("w"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        pending = Some(toks)
        toks = next
      }
      r += 1
    }
    // the last fused frame has no follow-up aggregate — settle it
    // before dropping its parent
    pending.foreach { p => toks.count(); p.unpersist() }
    (merges.toSeq, toks)
  }

  /** Repetition ratios (the Gopher-style quality rules): per document,
    * the fraction of duplicate 2-grams and 3-grams — high values mean
    * boilerplate/looping text. Pure per-row projection via the
    * codegen'd shingle kernel; `rep_ok` applies the paper-shaped
    * thresholds (dup-2gram < 0.2, dup-3gram < 0.18). Documents too
    * short for a gram level report 0 for it. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = normToks(col(textCol))
    def dupFrac(k: Int) = {
      val sh = graft.expressions.VectorExpressions.shinglesN(w, k)
      when(size(sh) <= 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(sh)).cast("double") /
          size(sh).cast("double"))
    }
    df.select(col(idCol),
      dupFrac(2).as("dup2_frac"),
      dupFrac(3).as("dup3_frac"))
      .withColumn("rep_ok",
        col("dup2_frac") < 0.2 && col("dup3_frac") < 0.18)
  }

  /** Per-document keyword extraction: the top `k` tokens ranked by
    * term frequency with a rarest-first tiebreak (document frequency
    * ascending, then token) — the integer-deterministic cousin of
    * tf-idf, chosen so the ranking is exactly reproducible across
    * engines (no transcendental idf in the sort key).
    *
    * Scale shape: two hash aggregates (per-(doc,token) tf, per-token
    * df over the already-distinct pairs), one shuffle join on token,
    * and a per-document window — nothing global. */
  def keywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol),
      explode(normToks(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfc, "token")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rk"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word `n`-gram with a held-out benchmark corpus (the standard
    * test-set-leakage filter run before LLM pre-training). Returns
    * (id, n_hits) for contaminated documents — anti-join the result
    * against the corpus to drop them.
    *
    * Scale shape: the benchmark is orders of magnitude smaller than
    * the corpus, so its distinct gram set is BROADCAST — the corpus
    * side stays a map-only scan + broadcast-hash-join + partial
    * count, no all-to-all shuffle of 100 TB of grams. Gram extraction
    * is the codegen'd shingle kernel, per-doc distinct. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val probeGrams = docs.select(col(idCol),
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(textCol)), n, distinct = true)).as("g"))
    val benchGrams = benchmark.select(
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(benchTextCol)), n, distinct = true))
        .as("g")).distinct()
    probeGrams.join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Contamination report from the BENCHMARK side — the audit view of
    * [[decontaminate]]: per benchmark document, how many corpus
    * documents share at least one distinct `n`-gram with it, and the
    * total shared-gram pair count. This is what an eval owner reads
    * to decide whether a benchmark is burned; zero-hit benchmark docs
    * are reported with zeros (a full audit, not just the leaky rows).
    *
    * Shape: same broadcast gram join as [[decontaminate]] (benchmark
    * is the small side by contract; the Bloom path covers huge ones),
    * then CASCADED aggregates — (bench, doc) pair hits first, then
    * per-bench totals — so there is no count-DISTINCT expand. */
  def contaminationReport(docs: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 8): DataFrame = {
    val probeGrams = docs.select(col(idCol).as("__pid"),
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(textCol)), n, distinct = true)).as("g"))
    val benchGrams = benchmark.select(col(benchIdCol).as("bench_id"),
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(benchTextCol)), n, distinct = true))
        .as("g"))
    val pairHits = probeGrams.join(broadcast(benchGrams), "g")
      .groupBy(col("bench_id"), col("__pid"))
      .agg(count(lit(1)).as("__h"))
    val agg = pairHits.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_docs_hit"), sum(col("__h")).as("n_gram_hits"))
    benchmark.select(col(benchIdCol).as("bench_id")).distinct()
      .join(agg, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("n_gram_hits"), lit(0L)).as("n_gram_hits"))
  }

  /** A Bloom filter that ships as its serialized bits and rebuilds
    * lazily once per executor JVM (the sketch object itself need not
    * be Serializable). */
  private class SerializableBloom(bytes: Array[Byte]) extends Serializable {
    @transient lazy val bf: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
  }

  /** [[decontaminate]] for a benchmark whose distinct gram set is too
    * large to broadcast as values: the grams fold into a BLOOM FILTER
    * (one distributed treeAggregate; the broadcast payload is the
    * filter's fixed bit array, `-n·ln(fpp)/ln²2` bits regardless of
    * gram bytes), and the corpus side stays a map-only membership
    * probe. False positives only OVER-flag — a clean document may be
    * dropped, a leaked one is never kept — there are no false
    * negatives. The realized rate is `fpp` down to the sketch
    * implementation's floor: its 32-bit double-hashing index scheme
    * bottoms out around ~1e-4 (measured here), so requesting fpp
    * below that buys bits but not accuracy. Same output contract as
    * [[decontaminate]]: (id, n_hits) over grams passing the filter. */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      fpp: Double = 1e-4): DataFrame = {
    val bloom = benchmarkBloom(benchmark, benchTextCol, n, fpp)
    val hit = bloomHitUdf(docs.sparkSession, bloom)
    docs.select(col(idCol),
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(textCol)), n, distinct = true)).as("g"))
      .where(hit(array(col("g"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Build the benchmark-gram Bloom filter (distributed fold via the
    * stat API; only the bit array lands on the driver). */
  def benchmarkBloom(benchmark: DataFrame, benchTextCol: String,
      n: Int, fpp: Double): Array[Byte] = {
    val benchGrams = benchmark.select(
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks(col(benchTextCol)), n, distinct = true))
        .as("g")).distinct()
    val bf = benchGrams.stat.bloomFilter("g",
      math.max(1L, benchGrams.count()), fpp)
    val bos = new java.io.ByteArrayOutputStream
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** any-gram-might-be-benchmark predicate over a gram array column,
    * against a broadcast serialized Bloom filter. */
  def bloomHitUdf(spark: org.apache.spark.sql.SparkSession,
      bloomBytes: Array[Byte])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(new SerializableBloom(bloomBytes))
    udf((gs: Seq[String]) => gs != null &&
      gs.exists(bc.value.bf.mightContainString))
  }

  /** Quality-filter funnel: the staged corpus-cleaning report every
    * training pipeline starts with. Four nested stages — length,
    * token count, type-token ratio, max-token-frequency — each
    * implying the previous; returns survivor counts per `groupCol`.
    *
    * All predicates are integer comparisons (ratio thresholds are
    * cross-multiplied) so the counts are exact on any engine. One
    * map-only projection + one hash aggregate on the group key.
    */
  /** The funnel's four per-row stage predicates as `__s1..__s4`
    * columns appended to `df` — the reusable form: [[filterFunnel]]
    * aggregates them per group, `TrainingData.curate` filters on
    * `__s4`. Map-only. */
  def funnelStages(df: DataFrame, textCol: String,
      charsCol: String): DataFrame = {
    val w = normToks(col(textCol))
    val nTok = size(w)
    val nUniq = size(array_distinct(w))
    // highest per-token occurrence count within the doc (O(distinct ·
    // tokens) per row, bounded by doc length; no shuffle)
    val maxFreq = array_max(transform(array_distinct(w),
      t => size(filter(w, x => x === t))))
    val s1 = col(charsCol) >= 200
    val s2 = s1 && nTok >= 40
    val s3 = s2 && nUniq * 2 >= nTok            // TTR >= 0.5
    val s4 = s3 && maxFreq * 10 <= nTok         // top token <= 10%
    df.withColumn("__s1", s1).withColumn("__s2", s2)
      .withColumn("__s3", s3).withColumn("__s4", s4)
  }

  def filterFunnel(df: DataFrame, groupCol: String, textCol: String,
      charsCol: String): DataFrame = {
    def c(p: Column) = sum(when(p, 1L).otherwise(0L))
    funnelStages(df, textCol, charsCol)
      .select(col(groupCol), col("__s1").as("s1"), col("__s2").as("s2"),
        col("__s3").as("s3"), col("__s4").as("s4"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_total"), c(col("s1")).as("n_len"),
        c(col("s2")).as("n_tokens"), c(col("s3")).as("n_ttr"),
        c(col("s4")).as("n_rep"))
  }

  /** Per-document corpus-frequency mass — the SQL-expressible core of
    * unigram language-model scoring: for each document, the sum over
    * its token occurrences of that token's corpus-wide count, plus the
    * rarest token's count. High mass/token = boilerplate-like, low =
    * novel; `rarest` flags OOV-ish outliers. Integer sums only.
    *
    * Scale shape: explode → count per token (map-side combinable) →
    * join back → per-doc sum. The token-count table is Zipf-small
    * relative to the corpus and broadcastable at real scale; the big
    * side is touched exactly twice, map-only.
    */
  def unigramMass(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(normToks(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    toks.join(counts, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("c")).as("freq_mass"),
        min(col("c")).as("rarest"))
  }

  /** Integer tf-idf term relevance: score each document against a
    * fixed term set with Σ_t tf(t,d) · idf_int(t), where idf_int =
    * (N·1,000,000) div (df(t)+1) — all-integer arithmetic, so scores
    * and ranks are bit-identical cross-engine (the determinism rule
    * every scoring operator here follows). Returns the global top-n
    * by (score desc, id asc).
    *
    * Scale shape: tf is a map-only pass (one `filter`+`size` per term
    * over the token array); df and N are two tiny aggregates
    * cross-joined back as one broadcast row; the final top-n is
    * TakeOrderedAndProject, not a full sort.
    */
  def termRelevance(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topN: Int): DataFrame = {
    val toks = df.select(col(idCol), normToks(col(textCol)).as("w"))
    def tf(t: String) = size(filter(col("w"), x => x === lit(t)))
    // pinned: the corpus-stats aggregate AND the scoring projection
    // both read the tf rows — without the checkpoint each branch
    // re-runs the tokenize + per-term scan over the whole corpus.
    // LAZY: the stats broadcast build is the first job of the final
    // action and populates the cache; the scoring stage (gated on
    // that broadcast) then reads it — no separate barrier job.
    val tfs = toks.select(col(idCol) +:
      terms.zipWithIndex.map { case (t, i) =>
        tf(t).cast("long").as(s"tf$i")
      }: _*).localCheckpoint(eager = false)
    // underscore-prefixed stat names: the single broadcast row joins
    // onto every doc row, so its columns must not shadow the id column
    val stats = tfs.agg(count(lit(1)).as("__n"),
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = tfs.crossJoin(broadcast(stats))
      .withColumn("score",
        terms.indices.map { i =>
          col(s"tf$i") * expr(s"(__n * 1000000L) div (__df$i + 1L)")
        }.reduce(_ + _))
      .select(col(idCol), col("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topN)
  }

  /** Okapi BM25 retrieval (k1 = 1.2, b = 0.75) against a fixed query
    * term set — the ranking step of hard-negative mining / corpus
    * search — in all-integer arithmetic so scores and ranks are
    * bit-identical cross-engine:
    *
    *   idf_int(t) = (N · 1,000,000) div (df(t) + 1)        (as tf-idf)
    *   tfq(t,d)   = (tf·44·T·1000) div (20·tf·T + 6·T + 18·dl·N)
    *
    * tfq is the exactly-cleared fraction of the BM25 tf-normalization
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with k1 = 6/5,
    * b = 3/4 and avgdl = T/N (multiply through by 20·T), scaled ×1000
    * before the floor. score(d) = Σ_t idf_int(t) · tfq(t,d).
    *
    * Scale shape mirrors [[termRelevance]]: tf/dl are a map-only pass,
    * (N, T, df_t) is one tiny broadcast row, and the top-n is
    * TakeOrderedAndProject. The 1e6 idf scale bounds intermediates to
    * ≲1e15 at petabyte corpus sizes; for N beyond ~1e10 documents drop
    * the scale factor a decade to stay inside int64. */
  def bm25Retrieval(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topN: Int): DataFrame = {
    val toks = df.select(col(idCol), normToks(col(textCol)).as("w"))
    def tf(t: String) = size(filter(col("w"), x => x === lit(t)))
    // pinned (LAZY) — same two-branch shape and materialization
    // order as termRelevance's tf rows
    val tfs = toks.select(col(idCol) +: size(col("w")).cast("long").as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        tf(t).cast("long").as(s"tf$i")
      }: _*).localCheckpoint(eager = false)
    val stats = tfs.agg(count(lit(1)).as("__n"),
      sum(col("dl")).as("__t") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = tfs.crossJoin(broadcast(stats))
      .withColumn("score",
        terms.indices.map { i =>
          // greatest(…,1): the denominator is 0 only when every doc
          // tokenizes empty (T=0), where tf=0 makes the numerator 0
          // anyway — the guard keeps the degenerate corpus at score 0
          // instead of NULL (and keeps the DuckDB oracle, whose `//`
          // raises on /0, in agreement)
          expr(s"((__n * 1000000L) div (__df$i + 1L)) * " +
            s"((tf$i * 44L * __t * 1000L) div " +
            s"greatest(20L * tf$i * __t + 6L * __t + 18L * dl * __n, 1L))")
        }.reduce(_ + _))
      .select(col(idCol), col("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topN)
  }

  /** PII patterns shared by the Spark operator and the DuckDB oracle —
    * restricted to syntax with identical semantics in Java regex and
    * RE2 (char classes, bounded repeats, \b, leftmost greedy match):
    * emails, IPv4 literals, and phone-shaped digit runs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** PII scrub — the standard curation step before training: count
    * each class, then redact with typed placeholders. Order matters
    * and is fixed (email → ipv4 → phone) so a phone scan never eats
    * the digits of an address already replaced. Pure per-row
    * `regexp_count`/`regexp_replace` projections — codegen'd,
    * shuffle-free, linear at any corpus size. */
  /** Corpus-frequency quality signal: per document, how much of it is
    * made of RARE words — tokens whose corpus document-frequency is ≤
    * `maxDf`. High rare-share flags OCR noise, codes/ids, and
    * boilerplate-free junk; near-zero flags template text. Exact
    * integers throughout (`rare_permille` is integer floor division),
    * so the oracle matches bit for bit.
    *
    * Scale: explode → two cascaded hash aggregates ((doc,tok) then
    * tok) → one equi-join on the token. The (doc,tok) pre-aggregate
    * bounds both the df computation and the join at distinct tokens
    * per doc — the same no-distinct-expand shape as the q88 corpus
    * scan; nothing is ever all-pairs. */
  def rareTokenScore(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int = 2): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(normToks(col(textCol))).as("tok"))
    val docTok = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val dfreq = docTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    docTok.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("df") <= maxDf, col("c")).otherwise(lit(0L)))
          .as("n_rare"))
      .withColumn("rare_permille",
        expr("(1000 * n_rare) div n_tokens"))
  }

  /** Vocabulary coverage / OOV rate — the signal that sizes a
    * tokenizer's vocab: fix the top-`topV` corpus tokens by occurrence
    * count (ties broken by token, so the cut is deterministic in any
    * engine) and report per document how many of its token
    * OCCURRENCES fall outside that vocabulary. Exact integers
    * (`oov_permille` is floor division).
    *
    * Scale: explode → (doc,tok) pre-aggregate → token totals → a
    * driver-bounded top-V (TakeOrdered over distinct tokens, V rows)
    * broadcast back — the per-doc join never shuffles the corpus on
    * anything but the (doc,tok) key. Documents with zero tokens have
    * no occurrences and drop out, same as the oracle. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topV: Int = 256): DataFrame = {
    val docTok = df.select(col(idCol).as("doc_id"),
        explode(normToks(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val vocab = docTok.groupBy(col("tok"))
      .agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topV)
      .select(col("tok"), lit(true).as("in_vocab"))
    docTok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L)))
          .as("n_oov"))
      .withColumn("oov_permille", expr("(1000 * n_oov) div n_tokens"))
  }

  /** n-gram LM perplexity filter — the CCNet-shaped quality signal
    * (Wenzek et al. 2020: score documents against a language model
    * trained on a trusted/held-out slice; drop the worst tail): a
    * bigram count LM is trained on the `doc_id % heldEvery == 0`
    * slice, and every document is scored by its total quantized
    * negative log-likelihood in BITS, all in exact integers so the
    * oracle hash-matches:
    *
    *   q(p, n)  = max(1, ((c2(p,n) + 1) · 2^20) // (c1(p) + V + 1))
    *   bits     = 20 − floor(log2 q)   [= 21 − len(bin q), exact]
    *   nll_bits = Σ over adjacent token pairs
    *   ppl_q    = (nll_bits · 1000) // n_pairs    (mean bits ×1000 —
    *              the threshold a filter cuts on; 2^(ppl_q/1000) is
    *              the usual perplexity)
    *
    * Add-one smoothing with an OOV slot in the denominator (`+ V +
    * 1`) keeps q ∈ [1, 2^20] and the pipeline total even when the
    * train slice is empty. Documents with < 2 tokens emit no row.
    *
    * Scale: two hash-aggregates over the train slice build the count
    * tables (c1 keyed by token, c2 by bigram); scoring is two
    * shuffle equi-joins on those keys — corpus-token-sized, never
    * all-pairs — plus a 1-row broadcast for V. Skewed prefixes (stop
    * words) are single hot KEYS in an equi-join, the AQE-splittable
    * case, not a fan-out. */
  def ngramLmPerplexity(df: DataFrame, idCol: String, textCol: String,
      heldEvery: Int = 10): DataFrame = {
    require(heldEvery >= 1, s"heldEvery must be >= 1, got $heldEvery")
    val toks = df.select(col(idCol).cast("long").as("id"),
      normToks(col(textCol)).as("w"))
    val pairs = toks
      .select(col("id"), col("w"), posexplode(col("w")).as(Seq("i", "n")))
      .where(col("i") >= 1)
      .select(col("id"), element_at(col("w"), col("i")).as("p"), col("n"))
    val trainToks = toks.where(pmod(col("id"), lit(heldEvery)) === 0)
      .select(explode(col("w")).as("t"))
    val c1 = trainToks.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val c2 = pairs.where(pmod(col("id"), lit(heldEvery)) === 0)
      .groupBy(col("p"), col("n")).agg(count(lit(1)).as("c2"))
    val v = trainToks.agg(count_distinct(col("t")).as("v"))
    pairs
      .join(c2, Seq("p", "n"), "left")
      .join(c1.withColumnRenamed("t", "p"), Seq("p"), "left")
      .crossJoin(broadcast(v)) // one row: the train vocab size
      .withColumn("q", greatest(
        expr("((coalesce(c2, 0) + 1) * 1048576) div (coalesce(c1, 0) + v + 1)"),
        lit(1L)))
      .withColumn("bits", lit(21L) - length(bin(col("q"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("bits")).as("nll_bits"))
      .select(col("id").as("doc_id"), col("n_pairs"), col("nll_bits"),
        expr("(nll_bits * 1000) div n_pairs").as("ppl_q"))
  }

  /** fastText-style linear quality classifier in exact integers —
    * the other half of CCNet's filtering alongside
    * [[ngramLmPerplexity]]: hashed unigram + bigram features, an
    * integer weight table, and an exact integer dot-product argmax.
    * Training happens offline (fastText's real training loop is not a
    * SQL shape); here the weight table is a fixed deterministic
    * function weight(bucket, class) = (bucket·31 + class·17) mod 201
    * − 100 over `nBuckets` = 256 md5-prefix feature buckets — the
    * SERVING path (hash → bucket → sum → argmax) is the production
    * operator, and any trained weight table drops in via the same
    * (bucket, class) → weight contract.
    *
    * Feature bucket = the first two hex digits of md5(feature)
    * (0..255), reproducible on any engine with md5. Ties in the
    * argmax resolve to the smallest class. Returns (doc_id,
    * n_features, best_class, best_score).
    *
    * Scale: map-only — per row one token pass builds the feature
    * array (unigrams + space-joined bigrams) and `nClasses` integer
    * reductions score it; no shuffle, no UDF, nothing driver-side
    * (a real trained table would arrive as one broadcast map). */
  def linearClassify(df: DataFrame, idCol: String, textCol: String,
      nClasses: Int = 4): DataFrame = {
    require(nClasses >= 1 && nClasses <= 64, s"bad nClasses $nClasses")
    val w = normToks(col(textCol))
    val feats = concat(w,
      graft.expressions.VectorExpressions.shinglesN(w, 2))
    val buckets = transform(feats, f =>
      conv(substring(md5(f), 1, 2), 16, 10).cast("long"))
    // bind the bucket array ONCE (the HOF lambda-rebinding rule):
    // scoring it inside each per-class aggregate would md5 every
    // feature nClasses times; referencing the packed result from
    // several select columns would re-evaluate it per column, so the
    // struct goes through its own projection (CollapseProject keeps
    // multi-referenced non-trivial aliases materialized)
    val packed = element_at(transform(array(buckets), bs => {
      val scores = (0 until nClasses).map { c =>
        aggregate(bs, lit(0L),
          (acc, b) => acc + (pmod(b * 31L + c * 17L, lit(201L)) - 100L))
      }
      // argmax via greatest(struct(score, -class)): max score, ties
      // to the smallest class — one in-row comparison chain
      val best =
        if (nClasses == 1) struct(scores.head.as("s"), lit(0).as("negc"))
        else greatest(scores.zipWithIndex.map { case (s, c) =>
          struct(s.as("s"), lit(-c).as("negc"))
        }: _*)
      struct(size(bs).cast("long").as("nf"), best.as("best"))
    }), 1)
    df.select(col(idCol).as("doc_id"), packed.as("__p"))
      .select(col("doc_id"),
        col("__p.nf").as("n_features"),
        (-col("__p.best.negc")).cast("int").as("best_class"),
        col("__p.best.s").as("best_score"))
  }

  /** Unigram-LM (SentencePiece-style) tokenizer statistics — the
    * other standard subword family next to the BPE tier
    * (q107/q108/q116): each word segments into the vocabulary pieces
    * minimizing the total piece cost, by exact integer Viterbi DP
    * (Kudo's unigram LM, the public SentencePiece construction, with
    * -log p replaced by an integer cost so the oracle replays it):
    *
    *  - vocabulary: every single character, plus every 2..`maxPieceLen`
    *    character piece whose md5 first hex digit is < '8' (a
    *    deterministic half-density vocab both engines recompute);
    *  - cost(piece) = 1000 − 180·len + (md5 hex digits 2-3 as an
    *    integer 0..255) — longer pieces cheaper, so the DP prefers
    *    the longest vocab match but can be beaten by cheap splits,
    *    exactly the unigram-LM trade;
    *  - ties break to fewer pieces ((cost, pieces) lexicographic
    *    minimum — addition preserves the order, so the per-position
    *    DP state is globally optimal).
    *
    * Returns per document (doc_id, n_words, n_pieces, total_cost).
    * Map-only — the DP is O(len·maxPieceLen) per word with no state
    * outside the row, so this scales exactly like tokenization
    * itself; mapPartitions because a lexicographic-state Viterbi is
    * genuinely imperative (the one sanctioned escape hatch — a HOF
    * encoding would re-evaluate the cost table per position). */
  def unigramLmSegment(df: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"bad maxPieceLen $maxPieceLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val mdt = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          mdt.reset()
          val d = mdt.digest(
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val sb = new java.lang.StringBuilder(32)
          d.foreach(b => sb.append(f"${b & 0xff}%02x"))
          sb.toString
        }
        def hv(c: Char): Int = if (c <= '9') c - '0' else c - 'a' + 10
        // natural-language corpora repeat words massively, and the
        // DP result depends only on the word — memoize per partition
        // (bounded: a planet-scale vocabulary is still ~10^7 words;
        // the cap keeps a pathological partition from growing the
        // table without bound). Measured 27.4 s → 0.24 s at sf0.1
        // (with the caller-side repartition; see Pipeline13).
        val memo = new java.util.HashMap[String, Array[Long]]()
        def segment(word: String): Array[Long] = {
          val n = word.length
          val cost = new Array[Long](n + 1)
          val pieces = new Array[Long](n + 1)
          var i = 1
          while (i <= n) {
            var bestC = Long.MaxValue
            var bestP = Long.MaxValue
            var l = 1
            while (l <= math.min(maxPieceLen, i)) {
              val hx = md5hex(word.substring(i - l, i))
              if (l == 1 || hx.charAt(0) < '8') {
                val c = cost(i - l) + 1000L - 180L * l +
                  hv(hx.charAt(1)) * 16 + hv(hx.charAt(2))
                val p = pieces(i - l) + 1
                if (c < bestC || (c == bestC && p < bestP)) {
                  bestC = c; bestP = p
                }
              }
              l += 1
            }
            cost(i) = bestC; pieces(i) = bestP
            i += 1
          }
          Array(cost(n), pieces(n))
        }
        // Spark-exact trim: `trim()` strips only the SPACE character
        // (Java String.trim would also strip tabs/newlines and
        // diverge from normToks and the SQL oracle on "\thello")
        def trimSpaces(s: String): String = {
          var b = 0; var e = s.length
          while (b < e && s.charAt(b) == ' ') b += 1
          while (e > b && s.charAt(e - 1) == ' ') e -= 1
          s.substring(b, e)
        }
        it.map { case (id, text) =>
          // normToks semantics, replicated EXACTLY: locale-free
          // lowercase, space-only trim, regex split with limit -1
          // (Spark's split keeps trailing empty tokens; Java's
          // default split drops them), empty text → zero words
          val t = trimSpaces(text.toLowerCase(java.util.Locale.ROOT))
          val words: Array[String] =
            if (t.isEmpty) Array.empty else t.split("\\s+", -1)
          var totalCost = 0L
          var totalPieces = 0L
          words.foreach { word =>
            var bp = memo.get(word)
            if (bp == null) {
              bp = segment(word)
              if (memo.size < (1 << 22)) memo.put(word, bp)
            }
            totalCost += bp(0)
            totalPieces += bp(1)
          }
          (id, words.length.toLong, totalPieces, totalCost)
        }
      }.toDF("doc_id", "n_words", "n_pieces", "total_cost")
  }

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, lit(EmailRe), lit("<EMAIL>"))
    val t2 = regexp_replace(t1, lit(Ipv4Re), lit("<IP>"))
    val t3 = regexp_replace(t2, lit(PhoneRe), lit("<PHONE>"))
    df.select(
      col(idCol),
      regexp_count(t0, lit(EmailRe)).as("n_email"),
      regexp_count(t1, lit(Ipv4Re)).as("n_ip"),
      regexp_count(t2, lit(PhoneRe)).as("n_phone"),
      t3.as("redacted"))
  }
}
