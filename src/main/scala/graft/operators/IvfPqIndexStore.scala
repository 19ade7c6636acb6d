package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF-PQ — the composition of the two persisted vector artifacts
  * into the shape a production 100 TB vector store actually runs
  * (the FAISS IVFADC layout, Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): a coarse quantizer prunes
  * the scan to `nprobe` Voronoi cells, and within the probed cells
  * vectors are scored from their PQ codes via an ADC lookup table —
  * the full-precision vectors are NEVER read at query time, and the
  * index stores m bytes-ish per vector instead of the float payload.
  *
  * Layout mirrors [[IvfIndexStore]]'s crash-safe versioned store
  * (`path/v=N/_COMMITTED` committed-version protocol, same
  * atomic-rename filesystem contract — see [[FsOps]]):
  *   - `v=N/centroids` — the coarse quantizer (≤ centroidCap
  *     deterministic sampled rows: cid, quantized vector, norm);
  *   - `v=N/codebook`  — the PQ training rows (id, quantized vector),
  *     from which probes rebuild per-query lookup tables;
  *   - `v=N/cells/cell=K/` — (nid, codes array<long>): every corpus
  *     vector reduced to its m sub-quantizer codes, partitioned by
  *     coarse cell, salted across `writeSplits` writer tasks per cell
  *     (hot-cell parallelism, invisible to readers).
  *
  * Probe plan at scale: the cells scan is PARTITION-PRUNED to the
  * ≤ Q·nprobe probed directories; the per-query LUT (|Q| × m × |C|
  * integer dots) broadcasts into one equi-join on (qid, s, code) with
  * a partially-combined sum — so query cost tracks the probed cells'
  * code rows, never corpus size or vector width. Scores are exact
  * integer ADC sums (same arithmetic as [[Similarity.pqTopK]]), so
  * the whole route is hash-comparable against the SQL oracle (q124).
  */
object IvfPqIndexStore {

  import IvfIndexStore.qcos

  private[graft] def currentVersion(spark: SparkSession,
      path: String): Option[Long] =
    VersionedStore.currentVersion(spark, path)

  /** Train both quantizers (deterministic samples), assign + encode
    * the corpus in ONE pass (the coarse argmax and the PQ kernel run
    * in the same projection, so the corpus is read once), then the
    * salted hash-partitioned write by cell.
    *
    * `centroidEvery` samples the COARSE quantizer (FAISS's nlist
    * axis: fewer, bigger cells → better recall per probe);
    * `codebookEvery` samples the PQ codebook (the fine axis: denser
    * codebook → lower quantization error). They default to the same
    * stride — the q124 oracle's parameterization — but are
    * independent, exactly as in IVFADC. */
  def write(corpus: DataFrame, path: String,
      centroidEvery: Int = 25, centroidCap: Int = 256,
      m: Int = 8, codebookSize: Int = 256,
      writeSplits: Int = 8, codebookEvery: Int = -1,
      byResidual: Boolean = false): Unit = {
    val cbEvery = if (codebookEvery > 0) codebookEvery else centroidEvery
    val spark = corpus.sparkSession
    require(corpus.isEmpty ||
      !corpus.where(col("id") % centroidEvery === 0).isEmpty,
      s"IVF-PQ sample is empty (no id % $centroidEvery == 0 rows)")
    val (current, next) = VersionedStore.prepareStage(spark, path)
    val vdir = s"$path/v=$next"

    val base = corpus.select(col("id"), quantize(col("vec")).as("q"))
    val cent = broadcast(base
      .where(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), col("q").as("cv"))
      .orderBy(col("cid")).limit(centroidCap)
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double"))))
    // the argmax-by-struct collapses the |corpus|×|C| broadcast
    // expansion map-side (one compact row per vector, carrying the
    // quantized vector through first()); the PQ kernel then runs in
    // the post-aggregate projection — ONCE per vector. Encoding
    // before the cross join would let Catalyst inline the kernel into
    // the joined projection and evaluate it |C| times per vector
    // (measured 4× slower at the 20× probe).
    val corp = base.select(col("id").as("nid"), col("q"))
      .withColumn("nn", sqrt(qdot(col("q"), col("q")).cast("double")))
    val assigned0 = corp.crossJoin(cent)
      .select(col("nid"), col("q"),
        struct(qcos(col("q"), col("nn"), col("cv"), col("cn")).as("c"),
          (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("q")).as("q"), max(col("sc")).as("m"))
      .select(col("nid"), col("q"), (-col("m.nc")).as("cell"))
    // FAISS's by_residual: the PQ encodes q − centroid(cell) — the
    // residual has far less variance than the raw vector, so the
    // same codebook budget buys lower quantization error. The
    // codebook trains on the SAMPLE ROWS' OWN residuals (same
    // deterministic id % cbEvery selection as pqTrain).
    val toEncode =
      if (!byResidual) assigned0
      else assigned0
        .join(cent.select(col("cid"), col("cv")),
          assigned0("cell") === col("cid"))
        .select(col("nid"),
          zip_with(col("q"), col("cv"), (a, b) => a - b).as("q"),
          col("cell"))
    // residual codebooks sample residue class 1, not 0: class 0 IS
    // the centroid set, whose residuals are identically zero — a
    // degenerate codebook that reconstructs every vector to its
    // centroid (spec-asserted via the ADC-error comparison)
    val cbOffset = if (byResidual) 1 else 0
    val ck = Similarity.pqTrain(
      toEncode.select(col("nid").as("id"), col("q")),
      m, cbEvery, codebookSize, cbOffset)
    val assigned = toEncode.select(col("nid"),
      graft.expressions.VectorExpressions
        .pqEncodeN(col("q"), m, ck.cids, ck.cb, ck.cb2).as("codes"),
      col("cell"))
    assigned
      .withColumn("salt", pmod(xxhash64(col("nid")), lit(writeSplits)))
      .repartition(col("cell"), col("salt"))
      .sortWithinPartitions("cell", "nid")
      .drop("salt")
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$vdir/cells")
    cent.select(col("cid"), col("cv"), col("cn"))
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/centroids")
    toEncode.where(col("nid") % cbEvery === cbOffset)
      .select(col("nid").as("id"), col("q"))
      .orderBy(col("id")).limit(codebookSize)
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/codebook")
    // the quantizer parameters are part of the artifact: a probe with
    // a DIFFERENT m would slice the LUT subvectors wrongly and return
    // silently wrong ADC scores, so probes validate (or derive) m
    // against this record (round-11 ADVICE); byResidual likewise
    // changes the scoring identity, so probes read it from here
    writeParams(spark, vdir, s"""{"m":$m,"codebookSize":$codebookSize,"centroidEvery":$centroidEvery,"centroidCap":$centroidCap,"byResidual":$byResidual}""")
    VersionedStore.commitMarker(spark, vdir)
    VersionedStore.gcPrevious(spark, path, current)
  }

  private def writeParams(spark: SparkSession, vdir: String,
      json: String): Unit =
    VersionedStore.writeText(spark, s"$vdir/params.json", json)

  /** The m the index was WRITTEN with. A caller-passed m ≤ 0 derives
    * it from here; a positive caller m must match it — mismatches
    * fail loudly instead of mis-slicing the ADC LUT. */
  private def resolveM(spark: SparkSession, vdir: String,
      callerM: Int): Int =
    VersionedStore.readTextIfExists(spark, s"$vdir/params.json") match {
      case Some(txt) =>
        val stored = """"m"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toInt)
          .getOrElse(
            sys.error(s"IvfPqIndexStore: no m in $vdir/params.json"))
        require(callerM <= 0 || callerM == stored,
          s"IvfPqIndexStore: probe m=$callerM != index m=$stored (written at $vdir)")
        stored
      case None =>
        // a store written before params records existed: an explicit
        // caller m keeps it readable; deriving is impossible
        require(callerM > 0, s"IvfPqIndexStore: $vdir predates " +
          "params.json — pass the m it was written with explicitly")
        callerM
    }

  /** Whether the index encodes residuals — part of the artifact
    * (changes the scoring identity), so probes read it, never guess.
    * Absent in pre-residual params records → false. */
  private def resolveByResidual(spark: SparkSession,
      vdir: String): Boolean =
    VersionedStore.readTextIfExists(spark, s"$vdir/params.json")
      .exists(""""byResidual"\s*:\s*true""".r.findFirstIn(_).isDefined)

  /** Approximate top-k against the stored index: coarse-rank the
    * broadcast centroids per query, partition-prune the cells scan to
    * the probed directories, ADC-score the code rows inside them.
    * Returns (qid, nid, score BIGINT, rank) with deterministic
    * (score desc, nid asc) tie-breaks. */
  /** The shared probe plumbing: resolved vdir + m, the quantized
    * queries, the broadcast (qid, cid) probe set, and the
    * partition-pruned cells scan. */
  private final case class Pruned(vdir: String, m: Int, q: DataFrame,
      probes: DataFrame, cells: DataFrame, byResidual: Boolean)

  private def pruned(spark: SparkSession, path: String,
      queries: DataFrame, nprobe: Int, callerM: Int): Pruned = {
    val vdir = VersionedStore.servingDir(spark, path, "IvfPqIndexStore")
    val m = resolveM(spark, vdir, callerM)
    val byResidual = resolveByResidual(spark, vdir)
    val cent = broadcast(spark.read.parquet(s"$vdir/centroids"))
    val q = queries.select(col("id").as("qid"),
        quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double")))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    // qcdot rides along for the residual identity: score =
    // ⟨q, centroid(cell)⟩ + Σ LUT — zero when codes are absolute
    // materialized once (≤ |queries| · nprobe rows): the pruning
    // collect and the cells join would otherwise each re-run the
    // crossJoin + ranking window
    val probes = broadcast(q.crossJoin(cent)
      .select(col("qid"), col("cid"),
        qcos(col("qv"), col("qn"), col("cv"), col("cn")).as("pcos"),
        (if (byResidual) qdot(col("qv"), col("cv"))
         else lit(0L)).as("qcdot"))
      .withColumn("prank", row_number().over(pw))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("cid"), col("qcdot"))
      .localCheckpoint())
    // bounded driver list (≤ |queries| · nprobe) → partition pruning
    val probedCells = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0))
    // probed dirs only — see VersionedStore.readProbedCells
    val cells = VersionedStore
      .readProbedCells(spark, s"$vdir/cells", probedCells)
      .getOrElse(spark.read.parquet(s"$vdir/cells")
        .where(col("cell").cast("long").isInCollection(probedCells)))
      .select(col("nid"), col("codes"),
        col("cell").cast("long").as("cell"))
    Pruned(vdir, m, q, probes, cells, byResidual)
  }

  /** ADC scores over the pruned cells: (qid, nid, score BIGINT) —
    * score = ⟨q, reconstruction(codes)⟩ exactly, by LUT linearity;
    * for a by_residual index the reconstruction is centroid +
    * residual-recon, so the per-(query, cell) constant ⟨q, centroid⟩
    * (carried on the probe rows) adds to the LUT sum. */
  private def adcScores(spark: SparkSession, p: Pruned): DataFrame = {
    // per-query ADC lookup table from the stored codebook (tiny):
    // (qid, s, code, pdot) — the integer dot of the query's subvector
    // s against codebook entry `code` of sub-quantizer s
    val lut = broadcast(
      Similarity.pqSubspaces(
          p.q.select(col("qid").as("id"), col("qv").as("q")), p.m, "qid")
        .join(Similarity.pqSubspaces(
          spark.read.parquet(s"${p.vdir}/codebook"), p.m, "cid")
          .select(col("s"), col("cid").as("code"), col("sub").as("cv")),
          "s")
        .select(col("qid"), col("s"), col("code"),
          qdot(col("sub"), col("cv")).as("pdot")))
    // cells × probes on the cell key (pruned), explode the m codes,
    // LUT equi-join, partially-combined per-(qid, nid) sum
    val candidates = p.cells
      .join(p.probes, p.cells("cell") === p.probes("cid"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qcdot"),
        posexplode(col("codes")))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
    candidates.join(lut, Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("nid"))
      // each nid lives in exactly one cell, so qcdot is constant per
      // (qid, nid) group — max() just carries it through the agg
      .agg((sum(col("pdot")) + max(col("qcdot"))).as("score"))
  }

  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 2, m: Int = -1): DataFrame = {
    val p = pruned(spark, path, queries, nprobe, m)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid").asc)
    adcScores(spark, p)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVFADC + exact refine (the FAISS `IndexRefineFlat` composition):
    * the cheap ADC pass shortlists `rerank` candidates per query from
    * the PQ store, then ONLY those are rescored with the exact
    * quantized cosine against the full vectors in a sibling
    * [[IvfIndexStore]] — the standard recall refinement, paying the
    * full-vector read for R rows per query instead of the probed
    * cells' entire population. The exact-vector fetch is an id
    * equi-join against the SAME probed cell partitions (both stores
    * share the coarse assignment, deterministic by construction), so
    * the refine stage stays partition-pruned too. Returns (qid, nid,
    * cos, rank) with the usual deterministic tie-breaks. */
  def probeRerank(spark: SparkSession, pqPath: String, ivfPath: String,
      queries: DataFrame, k: Int, rerank: Int = 20, nprobe: Int = 2,
      m: Int = -1): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must be >= k $k")
    // the two store probes are independent until the final semi-join,
    // and each runs a chain of small driver actions (probe pin,
    // pruning collect, store listing) during CONSTRUCTION — build
    // them on two threads so their jobs interleave instead of queuing
    // (guide §2.6 overlap-independent-jobs; actions are only
    // sequential because the driver calls them sequentially)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fShortlist = Future(probe(spark, pqPath, queries, k = rerank,
      nprobe = nprobe, m = m).select(col("qid"), col("nid")))
    val fCands = Future(
      IvfIndexStore.probeCandidates(spark, ivfPath, queries, nprobe))
    val shortlist = Await.result(fShortlist, Duration.Inf)
    // the same probed cells in the exact-vector store (both stores
    // share the deterministic coarse assignment): semi-join the ADC
    // shortlist against the UNRANKED pruned candidates, so the
    // ranking window only ever sorts ≤ R rows per query
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    Await.result(fCands, Duration.Inf)
      .join(shortlist, Seq("qid", "nid"), "left_semi")
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The middle quality tier between ADC-only [[probe]] and
    * flat-store [[probeRerank]]: rerank the ADC shortlist by the
    * COSINE against the PQ-RECONSTRUCTED vector — no flat vector
    * store needed, only the PQ index itself (FAISS's
    * reconstruction-based refinement). ADC already ranks by
    * ⟨q, recon⟩; the reconstructed cosine divides by ‖recon‖, which
    * re-orders candidates whose reconstructions differ in norm — the
    * component ADC ignores. Exact arithmetic: the dot IS the integer
    * ADC score (LUT linearity), and ‖recon‖² is the integer sum of
    * the chosen codebook entries' squared norms — one broadcast
    * (s, code, c2) table joined on the shortlist's exploded codes, so
    * the refine costs ≤ R·m LUT rows per query and never reads a
    * full-precision vector. Returns (qid, nid, cos, rank). */
  def probeRerankReconstructed(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, rerank: Int = 20, nprobe: Int = 2,
      m: Int = -1): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must be >= k $k")
    val p = pruned(spark, path, queries, nprobe, m)
    // ‖recon‖ below sums the chosen codebook entries' squared norms,
    // which is the reconstruction norm only for ABSOLUTE codes; a
    // residual index would need the centroid and cross terms too —
    // use the flat-store probeRerank for those indexes
    require(!p.byResidual, "probeRerankReconstructed does not support " +
      "a by_residual index; rerank against the flat store instead")
    val sw = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid").asc)
    val shortlist = adcScores(spark, p)
      .withColumn("srank", row_number().over(sw))
      .where(col("srank") <= rerank)
      .select(col("qid"), col("nid"), col("score"))
    // ‖recon‖² per shortlisted nid: codes live in the pruned cells
    // scan (each nid in exactly one cell); the (s, code, c2) norms
    // table is the codebook again — tiny, broadcast
    val c2 = broadcast(Similarity.pqSubspaces(
        spark.read.parquet(s"${p.vdir}/codebook"), p.m, "cid")
      .select(col("s"), col("cid").as("code"),
        qdot(col("sub"), col("sub")).as("c2")))
    val rn2 = p.cells
      .join(shortlist.select(col("nid")).distinct(), Seq("nid"), "left_semi")
      .select(col("nid"), posexplode(col("codes")))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
      .join(c2, Seq("s", "code"))
      .groupBy(col("nid")).agg(sum(col("c2")).as("rn2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    shortlist
      .join(rn2, Seq("nid"))
      .join(p.q.select(col("qid"), col("qn")), Seq("qid"))
      .withColumn("cos", col("score").cast("double") /
        (col("qn") * sqrt(col("rn2").cast("double"))))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
