package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** SQ8 — per-dimension scalar quantization, the FAISS
  * `IndexScalarQuantizer(QT_8bit)` tier: train a per-dimension affine
  * range (min, span) over the corpus, store each vector as one byte
  * per dimension, and score queries against the RECONSTRUCTIONS
  * without ever re-reading the float payload. It completes the
  * quantization family next to [[IvfIndexStore]] (cells, exact
  * vectors) and [[IvfPqIndexStore]] (cells + product codes): SQ8 is
  * the flat-but-4×-smaller middle ground that production embedding
  * stores ship when recall matters more than the deepest compression.
  *
  * Quantization (all exact integer arithmetic over the 1000-scaled
  * quantized vectors, so the q132/q133 oracles hash-match):
  *   - code_d = round_half_up(255 · (x_d − min_d) / span_d)
  *     computed as (510·(x−min) + span) div (2·span) — numerator is
  *     non-negative (min is the global per-dimension minimum), so
  *     Spark's `div` (truncating) and DuckDB's `//` (flooring) agree;
  *   - 255·reconstruction_d = 255·min_d + code_d·span_d, hence
  *     255·⟨q, recon⟩ = 255·⟨q, min⟩ + ⟨q∘span, code⟩: one per-query
  *     constant plus one codegen'd integer dot ([[qdot]]) per
  *     candidate — the scan cost is a map over the 8-bit codes.
  *
  * Layout mirrors the shared [[VersionedStore]] crash-safe protocol
  * (`path/v=N/_COMMITTED`, reader-safe GC):
  *   - `v=N/stats` — (s, mn, span) per dimension (tiny);
  *   - `v=N/codes` — (nid, codes array<long>), salted across
  *     `writeSplits` writer tasks;
  *   - `v=N/params.json` — the trained dimension count; probes
  *     validate query width against it instead of silently
  *     zip-truncating a mismatched vector.
  *
  * Scale: write is one elementwise min/max aggregation (the shuffle
  * carries `dim` rows per partition after partial aggregation) plus a
  * map-only encode; probe is the broadcast-query scan every flat
  * store pays — 4× less IO than the float scan — with the usual
  * per-query top-k window. The IVF composition (partition-pruned
  * cells of SQ8 codes) falls out of [[IvfIndexStore]]'s layout if a
  * deployment needs sublinear probes; the flat form is the
  * recall-first tier.
  *
  * Reference for semantics: FAISS ScalarQuantizer (public docs/paper
  * — Johnson, Douze, Jégou, "Billion-scale similarity search with
  * GPUs", 2017); re-expressed as declarative Spark plans.
  */
object SqIndexStore {

  private[graft] def currentVersion(spark: SparkSession,
      path: String): Option[Long] =
    VersionedStore.currentVersion(spark, path)

  /** Shared by [[IvfSqIndexStore]] (same stats/params layout). */
  private[operators] def statsOf(spark: SparkSession,
      vdir: String): (Array[Long], Array[Long]) = {
    val st = spark.read.parquet(s"$vdir/stats").orderBy("s").collect()
    (st.map(_.getLong(1)), st.map(_.getLong(2)))
  }

  private[operators] def storedDim(spark: SparkSession, vdir: String,
      store: String = "SqIndexStore"): Int = {
    val txt = VersionedStore.readText(spark, s"$vdir/params.json", store)
    """"dim"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(sys.error(s"$store: no dim in $vdir/params.json"))
  }

  /** The loud width guard over an already-quantized array column —
    * a mismatched vector must fail, never silently zip-truncate. */
  private[operators] def dimChecked(c: String, dim: Int,
      store: String, what: String): org.apache.spark.sql.Column =
    when(size(col(c)) === lit(dim), col(c))
      .otherwise(raise_error(concat(
        lit(s"$store: $what dim != stored dim $dim: got "),
        size(col(c)).cast("string"))).cast("array<bigint>"))

  /** Train the per-dimension ranges and encode the corpus — one
    * elementwise aggregation + one map pass, then the salted write. */
  def write(corpus: DataFrame, path: String, writeSplits: Int = 8): Unit = {
    val spark = corpus.sparkSession
    val (current, next) = VersionedStore.prepareStage(spark, path)
    val vdir = s"$path/v=$next"
    val base = corpus.select(col("id").as("nid"),
      quantize(col("vec")).as("q"))
    // per-dimension min/span: partial aggregation means the shuffle
    // carries dim rows per map partition, never corpus rows
    val stats = base.select(posexplode(col("q")).as(Seq("s", "x")))
      .groupBy(col("s"))
      .agg(min(col("x")).as("mn"),
        (max(col("x")) - min(col("x"))).as("span"))
    val st = stats.orderBy("s").collect() // bounded by the embedding dim
    require(st.nonEmpty, "SqIndexStore: empty corpus")
    val dim = st.length
    val mins = st.map(_.getLong(1))
    val spans = st.map(_.getLong(2))
    val codes = base.select(col("nid"),
      expr(encodeSql(mins, spans)).as("codes"))
    codes
      .withColumn("salt", pmod(xxhash64(col("nid")), lit(writeSplits)))
      .repartition(col("salt"))
      .sortWithinPartitions("nid")
      .drop("salt")
      .write.mode("overwrite").parquet(s"$vdir/codes")
    // persist the ALREADY-COLLECTED stats rows, not the `stats`
    // frame — re-executing it would re-scan the whole corpus for a
    // dim-sized table (and could diverge from the ranges the codes
    // above were actually encoded with)
    SqIndexStore.writeStats(spark, vdir, st)
    VersionedStore.writeText(spark, s"$vdir/params.json",
      s"""{"dim":$dim,"bits":8}""")
    VersionedStore.commitMarker(spark, vdir)
    VersionedStore.gcPrevious(spark, path, current)
  }

  /** Persist collected per-dimension stats rows (s, mn, span) —
    * shared by [[IvfSqIndexStore.write]]. */
  private[operators] def writeStats(spark: SparkSession, vdir: String,
      st: Array[org.apache.spark.sql.Row]): Unit = {
    import spark.implicits._
    st.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("s", "mn", "span")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/stats")
  }

  /** The SQ8 code kernel over the already-quantized array column
    * `q`: round-half-up affine code, clamped to the 8-bit endpoints.
    * The clamp is a no-op for training data (min/span are its own
    * range); for vectors encoded later under FROZEN ranges
    * ([[encodeFrozen]]) it is the standard scalar-quantizer drift
    * rule. Truncating-vs-flooring division never matters: in-range
    * numerators are non-negative, and out-of-range codes hit the
    * clamp either way. Package-visible: [[IvfSqIndexStore]] encodes
    * its cell payloads with the identical kernel. */
  private[operators] def encodeSql(mins: Array[Long],
      spans: Array[Long]): String = {
    val minsSql = mins.mkString("array(", "L,", "L)")
    val spansSql = spans.mkString("array(", "L,", "L)")
    s"""transform(q, (x, i) -> CAST(CASE
       |  WHEN element_at($spansSql, i + 1) = 0 THEN 0
       |  ELSE greatest(0L, least(255L,
       |    ((x - element_at($minsSql, i + 1)) * 510
       |     + element_at($spansSql, i + 1))
       |    div (2 * element_at($spansSql, i + 1)))) END AS BIGINT))"""
      .stripMargin
  }

  /** Encode vectors under the FROZEN ranges of the serving version —
    * the ingest half of train-once scalar quantization (works on a
    * stream: stateless per-row projection, no shuffle; see
    * [[graft.streaming.Streams.sqEncodeStream]]). Appending the
    * result to the serving version's `codes` table makes the new
    * vectors visible to the next probe. Returns (nid, codes). */
  def encodeFrozen(spark: SparkSession, path: String,
      vectors: DataFrame): DataFrame = {
    val vdir = VersionedStore.servingDir(spark, path, "SqIndexStore")
    val dim = storedDim(spark, vdir)
    val (mins, spans) = statsOf(spark, vdir)
    vectors.select(col("id").as("nid"), quantize(col("vec")).as("q"))
      .withColumn("q", dimChecked("q", dim, "SqIndexStore", "vector"))
      .select(col("nid"), expr(encodeSql(mins, spans)).as("codes"))
  }

  /** Broadcast queries with the precomputed per-query pieces:
    * (qid, qs = q∘span, qmin = ⟨q, min⟩), dimension-checked against
    * the stored params (a mismatched query fails loudly instead of
    * silently zip-truncating). */
  private def preparedQueries(queries: DataFrame,
      dim: Int, mins: Array[Long], spans: Array[Long]): DataFrame = {
    val minsL = typedlit(mins.toSeq)
    val spansL = typedlit(spans.toSeq)
    broadcast(queries
      .select(col("id").as("qid"), quantize(col("vec")).as("qv"))
      .withColumn("qv", dimChecked("qv", dim, "SqIndexStore", "query"))
      .withColumn("qs", zip_with(col("qv"), spansL, (a, b) => a * b))
      .withColumn("qmin", qdot(col("qv"), minsL))
      .select(col("qid"), col("qs"), col("qmin")))
  }

  /** Top-k by the exact integer reconstruction dot
    * 255·⟨q, recon(codes)⟩. The BroadcastNestedLoopJoin against the
    * bounded probe set IS the flat-scan plan (same contract as
    * Similarity's exact scoring, PlanSpec-listed); per-candidate work
    * is one codegen'd integer dot over the codes. Returns (qid, nid,
    * score BIGINT, rank) with (score desc, nid asc) tie-breaks. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int): DataFrame = {
    val vdir = VersionedStore.servingDir(spark, path, "SqIndexStore")
    val dim = storedDim(spark, vdir)
    val (mins, spans) = statsOf(spark, vdir)
    val q = preparedQueries(queries, dim, mins, spans)
    val codes = spark.read.parquet(s"$vdir/codes")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid").asc)
    codes.crossJoin(q)
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (col("qmin") * 255 + qdot(col("qs"), col("codes"))).as("score"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** SQ8 shortlist + exact refine (the `IndexRefineFlat` composition
    * over a scalar-quantized base): the compressed scan shortlists
    * `rerank` candidates per query, then ONLY those are rescored with
    * the exact quantized cosine against the full vectors — a
    * semi-join fetch of ≤ R rows per query, so the full-precision
    * reads never track corpus size. Returns (qid, nid, cos, rank). */
  def probeRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int = 20): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must be >= k $k")
    val shortlist = probe(spark, path, queries, k = rerank)
      .select(col("qid"), col("nid"))
    rerankExact(shortlist, corpus, queries, k)
  }

  /** The exact-cosine refine tail over a bounded (qid, nid)
    * shortlist — ≤ R full-precision rescores per query fetched by
    * semi-join; shared with [[IvfSqIndexStore.probeRerank]]. */
  private[operators] def rerankExact(shortlist: DataFrame,
      corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val exact = corpus
      .select(col("id").as("nid"), quantize(col("vec")).as("nv"))
      .join(shortlist, Seq("nid"), "left_semi")
      .withColumn("nn", sqrt(qdot(col("nv"), col("nv")).cast("double")))
    val q = broadcast(queries
      .select(col("id").as("qid"), quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double"))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    shortlist
      .join(exact, Seq("nid"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        (qdot(col("qv"), col("nv")).cast("double") /
          (col("qn") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
