package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and sequence packing for training-data
  * pipelines.
  *
  * Every operator here is reproducible by construction: selection is
  * keyed on a content/id digest, never on `rand()`. That is what makes
  * a 100 TB sampling job restartable (a re-run of a failed partition
  * picks the same rows), auditable (the oracle can recompute the exact
  * sample), and stable across cluster sizes (no per-partition RNG
  * seeds). The digests are plain md5 strings compared
  * lexicographically, which evaluates identically in Spark and DuckDB.
  *
  * Scale notes: the Bernoulli filter is a map-only predicate pushed at
  * the scan; stratified top-n shuffles once on the stratum key; packing
  * windows are partitioned by shard, so a planet-sized corpus packs
  * one shard per task with no global ordering anywhere.
  */
object Sampling {

  /** Digest used for all deterministic ordering/thresholding. */
  private def digest(idCol: String) =
    md5(col(idCol).cast("string"))

  /** Deterministic Bernoulli sample: keeps a row iff the first two hex
    * digits of md5(id) fall below `hexThreshold` (e.g. "1a" keeps
    * 26/256 ≈ 10.2%). A pure per-row predicate — no shuffle, no RNG
    * state, pushdown-friendly. */
  def hashSample(df: DataFrame, idCol: String,
      hexThreshold: String): DataFrame =
    df.where(substring(digest(idCol), 1, 2) < lit(hexThreshold))

  /** Deterministic stratified sample: the `n` rows of each stratum
    * with the smallest (md5(id), id) — a per-stratum uniform draw
    * that is exactly reproducible. One shuffle on the stratum key. */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(digest(idCol), col(idCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** Deterministic per-group top-n: the `n` rows of each group with
    * the largest (orderCol, then smallest id) — "best N documents per
    * domain/language" selection. One shuffle on the group key; the
    * window never sees more than a group per task, and at 100 TB the
    * group count (domains, languages) dwarfs the cluster size so
    * parallelism is not window-bound. */
  def topNPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** Deterministic source mixing: draw a fixed quota of rows per
    * source (the data-mixture step of a pre-training pipeline, with
    * weights expressed as absolute per-source quotas). Within a
    * source, rows are ranked by (md5(id), id) — the same reproducible
    * uniform draw as [[stratified]] — and the first `quota(source)`
    * (default `defaultQuota`) survive. */
  def sourceMix(df: DataFrame, srcCol: String, idCol: String,
      quota: Map[String, Int], defaultQuota: Int): DataFrame = {
    val quotaCol = quota.foldLeft(lit(defaultQuota)) {
      case (acc, (s, n)) => when(col(srcCol) === s, lit(n)).otherwise(acc)
    }
    val w = Window.partitionBy(col(srcCol))
      .orderBy(digest(idCol), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= quotaCol)
  }

  /** Temperature-scaled source mixing — the pretraining
    * mixture-reweighting shape (sample counts ∝ size^(1/T), here the
    * T=2 form): per-source targets are `budget · w_s / Σw` with
    * integer weights `w_s = ⌊√count_s⌋`, floored at one row so no
    * source vanishes, then the deterministic per-source top-target by
    * the md5 order used everywhere else. Up-weights the tail exactly
    * like temperature sampling at T=2 while staying pure integer /
    * IEEE arithmetic (weights and Σw are BIGINTs; the one division is
    * a single binary64 op) — exact on any engine, no RNG.
    *
    * Scale shape: the counts aggregate is map-side combinable and the
    * weights frame is |sources| rows (Σw is a 1-row aggregate joined
    * back on a constant key — no single-partition window anywhere);
    * the corpus side sees one broadcast join + the same per-source
    * selection window as [[sourceMix]]. */
  def temperatureMix(df: DataFrame, srcCol: String, idCol: String,
      budget: Int): DataFrame = {
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__w", floor(sqrt(col("__c"))).cast("long"))
    // Σw via a 1-row aggregate broadcast — the same value a
    // sum-over-all-rows window gives, without the single-partition
    // WindowExec that window plans (and warns about). The broadcast
    // nested loop this plans has a ONE-row build side by construction
    // (same justified class as the q70/q90 corpus-stats broadcasts).
    val total = counts.agg(sum(col("__w")).as("__tw"))
    val targets = counts
      .crossJoin(broadcast(total))
      .withColumn("__target",
        greatest(lit(1L),
          floor(lit(budget) * col("__w") / col("__tw")).cast("long")))
      .select(col(srcCol), col("__target"))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(digest(idCol), col(idCol))
    df.join(broadcast(targets), srcCol)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("__target"))
      .drop("__target")
  }

  /** Sequence packing: concatenate each shard's documents (in id
    * order) into one token stream and chop it into fixed-size context
    * windows, the standard LLM pre-training layout where documents may
    * straddle window boundaries. Returns per document its start
    * offset in the shard stream and the first/last window it lands
    * in. Windows are per-shard, so parallelism = number of shards and
    * no global sort exists. */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
      tokCountCol: String, windowTokens: Int): DataFrame =
    packSequencesBy(df, shardCol, Seq(idCol), idCol, tokCountCol,
      windowTokens)

  /** [[packSequences]] with an explicit within-shard read order —
    * the form a curriculum feeds: pack the stream in
    * [[TrainingData.curriculumOrder]]'s `pos` order (or any other
    * deterministic ordering) instead of id order. `orderCols` must be
    * a total order within the shard for the offsets to be
    * reproducible; same window shape, so parallelism stays = number
    * of shards. */
  def packSequencesBy(df: DataFrame, shardCol: String,
      orderCols: Seq[String], idCol: String, tokCountCol: String,
      windowTokens: Int): DataFrame = {
    // explicit ROWS frame: the default RANGE frame would merge
    // duplicate (shard, order) rows into one cumulative step,
    // overlapping their token ranges (and diverging from the
    // ROWS-framed oracle)
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokCountCol)).over(w)
    val start = (cum - col(tokCountCol)).as("start_offset")
    df.select((Seq(shardCol) ++ orderCols ++ Seq(idCol, tokCountCol))
        .distinct.map(col) :+ start :+ cum.as("end_offset"): _*)
      .where(col(tokCountCol) > 0)
      .withColumn("first_window",
        floor(col("start_offset") / windowTokens))
      .withColumn("last_window",
        floor((col("end_offset") - 1) / windowTokens))
  }

  /** Deterministic shard + position assignment for training-data
    * export: shard = first 8 md5(id) hex digits mod `nShards` (a
    * uniform, content-keyed split), position = rank within the shard
    * by (md5(id), id) — i.e. a reproducible GLOBAL shuffle of the
    * corpus into `nShards` ordered shard files, the step right before
    * a trainer reads the data. Re-runs, retries, and different
    * cluster sizes all produce byte-identical shards.
    *
    * Scale: one shuffle on the shard key; each shard sorts
    * independently (parallelism = nShards — pick nShards ≫ executors
    * for a planet corpus, trainers want many small shards anyway). */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val shard = pmod(conv(substring(digest(idCol), 1, 8), 16, 10)
      .cast("long"), lit(nShards)).as("shard")
    val w = Window.partitionBy(col("shard"))
      .orderBy(digest(idCol), col(idCol))
    df.select(col("*"), shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Token-budget curation: per group (source/domain), walk documents
    * in deterministic md5 order — a reproducible uniform shuffle, same
    * key as [[hashSample]] — keeping documents while the running token
    * total stays within `budget`. This is how a data mix is actually
    * assembled ("2B tokens of web, 500M of code"): the budget binds on
    * tokens, not documents, and the md5 walk makes the cut identical
    * on every re-run and cluster size.
    *
    * Scale: one window per group partition (running sum, ROWS frame) —
    * parallelism = number of groups. A single planet-sized group
    * serializes its window; shard such a group first (the same
    * md5-prefix sharding [[packSequences]] uses) and budget the shards.
    */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(digest(idCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(idCol),
        tokenCount.cast("long").as("n_toks"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .where(col("cum_toks") <= budget)
  }

  /** [[tokenBudget]] for a planet-sized group, with BIT-IDENTICAL
    * selection: the global-walk form serializes each group through
    * one window task, which is exactly what a single 100 TB web
    * domain breaks. This form splits every group's walk into 256
    * order-preserving segments — the shard key is the VALUE of the
    * md5 digest's first two hex chars, and hex strings sort
    * lexicographically as their value, so
    * `(shard ASC, md5 walk within shard)` IS the global md5 walk.
    * The running total then reassembles from three bounded steps:
    * a per-(group, shard) window (parallelism = groups × 256), a
    * per-group prefix over the ≤256 shard totals (trivial rows), and
    * an equi-join back on (group, shard). The offsets side is tiny
    * PER GROUP but group count is unbounded (per-domain grouping is
    * the use case), so no broadcast hint — AQE picks broadcast when
    * the total actually fits. Same (group, id, n_toks, cum_toks)
    * rows as [[tokenBudget]] on any input — spec'd equal — so the
    * sequential form is just its readable specification. */
  def tokenBudgetSharded(df: DataFrame, groupCol: String, idCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val base = df.select(col(groupCol), col(idCol),
        tokenCount.cast("long").as("n_toks"))
      .withColumn("shard",
        conv(substring(digest(idCol), 1, 2), 16, 10).cast("int"))
    val wIn = Window.partitionBy(col(groupCol), col("shard"))
      .orderBy(digest(idCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = base.withColumn("cum_in", sum(col("n_toks")).over(wIn))
    val wPrefix = Window.partitionBy(col(groupCol)).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(groupCol), col("shard"))
      .agg(sum(col("n_toks")).as("shard_total"))
      .withColumn("offset",
        coalesce(sum(col("shard_total")).over(wPrefix), lit(0L)))
      .select(col(groupCol), col("shard"), col("offset"))
    inShard.join(offsets, Seq(groupCol, "shard"))
      .select(col(groupCol), col(idCol), col("n_toks"),
        (col("offset") + col("cum_in")).as("cum_toks"))
      .where(col("cum_toks") <= budget)
  }
}
