package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join (queries
  * are broadcast; the 100 TB corpus side streams through) followed by a
  * per-query ranking window. Correct, embarrassingly parallel, O(|Q|·N).
  *
  * Scale path: random-hyperplane LSH — each vector gets a `planes`-bit
  * signature; vectors sharing a signature *band* become candidates, so
  * the join degenerates from cross product to an equi-join on band keys.
  * Hyperplanes are generated from a fixed seed on the driver and shipped
  * as literals (a few KB), so the plan stays fully declarative.
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes: `planes` × `dim`. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket id from `planes` hyperplanes (an int in
    * [0, 2^planes)). Same-bucket vectors are cosine-similar with high
    * probability. */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Brute-force top-k neighbors by exact double cosine.
    * `queries`/`corpus`: (id, vec). Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("qid"), col("vec").as("qvec")))
    val c = corpus.select(col("id").as("nid"), col("vec").as("nvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Brute-force top-k by *quantized* cosine ([[qcosine]]) — the
    * oracle-checked variant: integer arithmetic makes scores (and thus
    * ranks) bit-identical cross-engine. Same plan shape as
    * [[bruteForceTopK]]. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // per-vector norms precomputed before the cross join (not O(|Q|·N))
    val q = broadcast(queries.select(col("id").as("qid"),
      quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double"))))
    val c = corpus.select(col("id").as("nid"), quantize(col("vec")).as("cv"))
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double")))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (qdot(col("qv"), col("cv")).cast("double") /
          (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate top-k — the second scale path next
    * to LSH. The corpus is partitioned into Voronoi cells of a small
    * centroid set; a query probes only its `nprobe` nearest cells, so
    * the scored fraction is ~nprobe/|C| of the corpus.
    *
    * Centroids here are a deterministic corpus sample (`id %
    * centroidEvery == 0`) rather than k-means means — the cell/probe
    * plumbing (the part that matters for the plan shape and the
    * oracle) is identical, and sampled centroids keep the operator
    * fully declarative. Plan: centroids broadcast to both the
    * assignment join and the probe join; assignment collapses map-side
    * to one compact row per corpus vector, so the all-to-all traffic
    * is |corpus| assignment rows + the candidate equi-join on cell
    * id — never the cross-join expansion. All scores are quantized
    * integer cosine ([[qdot]]) — bit-identical cross-engine, ranks
    * deterministic with (score desc, id asc) tie-breaks. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nprobe: Int = 2, centroidEvery: Int = 25,
      centroidCap: Int = 256): DataFrame = {
    // same guard as pqTrain: an empty sample would erase the corpus
    // through the assignment cross-join instead of failing loudly
    require(corpus.isEmpty ||
      !corpus.where(col("id") % centroidEvery === 0).isEmpty,
      s"IVF centroid sample is empty (no id % $centroidEvery == 0 rows)")
    // centroid set capped at the `centroidCap` lowest sampled ids
    // (TakeOrderedAndProject): an uncapped %-sample grows |C| with the
    // corpus and turns the N×|C| assignment quadratic — the same trap
    // the PQ encode measured at 40k vectors
    val cent = broadcast(corpus
      .where(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), quantize(col("vec")).as("cv"))
      .orderBy(col("cid")).limit(centroidCap)
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double"))))
    val qcos = (v: Column, n1: Column, v2: Column, n2: Column) =>
      qdot(v, v2).cast("double") / (n1 * n2)

    val corp = corpus.select(col("id").as("nid"), quantize(col("vec")).as("nv"))
      .withColumn("nn", sqrt(qdot(col("nv"), col("nv")).cast("double")))
    // argmax-by-struct instead of a ranking window: max(struct(cos,
    // -cid)) is map-side combinable, so the post-broadcast-join
    // expansion collapses to one row per vector BEFORE any shuffle
    // (a window would sort-shuffle the whole |corpus|×|C| expansion)
    val assigned = corp.crossJoin(cent)
      .select(col("nid"), col("nv"), col("nn"),
        struct(qcos(col("nv"), col("nn"), col("cv"), col("cn")).as("c"),
          (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("nv")).as("nv"), first(col("nn")).as("nn"),
        max(col("sc")).as("m"))
      .select(col("nid"), col("nv"), col("nn"), (-col("m.nc")).as("cid"))

    val q = broadcast(queries.select(col("id").as("qid"),
      quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double"))))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    val probes = q.crossJoin(cent)
      .select(col("qid"), col("qv"), col("qn"), col("cid"),
        qcos(col("qv"), col("qn"), col("cv"), col("cn")).as("pcos"))
      .withColumn("prank", row_number().over(pw)).where(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    probes.join(assigned, "cid").where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        qcos(col("qv"), col("qn"), col("nv"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Lloyd-refined IVF centroids (k-means on cosine assignment): start
    * from the deterministic sample and run `iters` assignment → mean
    * rounds, entirely as DataFrame plans — assignment is the same
    * broadcast argmax as [[ivfTopK]] (map-side combinable, one compact
    * row per vector), the new means are a posexplode → per-(cell,dim)
    * avg → re-assembly. Each iteration is two shuffles of |corpus|
    * rows / |C|·dim cells; nothing driver-side. Empty cells simply
    * drop (their sample was redundant), matching standard Lloyd. */
  def kmeansCentroids(corpus: DataFrame, every: Int = 25,
      iters: Int = 2, centroidCap: Int = 256): DataFrame = {
    // norms precomputed per side BEFORE the cross join (3 dot products
    // per pair otherwise — the same rule every other pair loop here
    // follows)
    val corpN = corpus
      .select(col("id"), col("vec"), norm(col("vec")).as("vn"))
    var cent = corpus.where(col("id") % every === 0)
      .select(col("id").as("cid"), col("vec").cast("array<double>").as("cvec"))
      .orderBy(col("cid")).limit(centroidCap)
    (1 to iters).foreach { _ =>
      val centN = broadcast(cent
        .select(col("cid"), col("cvec"), norm(col("cvec")).as("cn")))
      val assigned = corpN.crossJoin(centN)
        .select(col("id"), col("vec"),
          struct((dot(col("vec"), col("cvec")) / (col("vn") * col("cn")))
            .as("c"), (-col("cid")).as("nc")).as("sc"))
        .groupBy(col("id"))
        .agg(first(col("vec")).as("vec"), max(col("sc")).as("m"))
        .select((-col("m.nc")).as("cid"), col("vec"))
      cent = assigned
        .select(col("cid"), posexplode(col("vec").cast("array<double>")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("cvec"))
    }
    cent
  }

  /** IVF top-k against an explicit centroid set — the shape used with
    * [[kmeansCentroids]] output (double cosine; the oracle-exact
    * sampled-centroid path is [[ivfTopK]]). */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val cent = broadcast(centroids
      .select(col("cid"), col("cvec").cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv"))))
    val assigned = corpus
      .select(col("id").as("nid"), col("vec").as("nvec"),
        norm(col("vec")).as("nn"))
      .crossJoin(cent)
      .select(col("nid"), col("nvec"), col("nn"),
        struct((dot(col("nvec"), col("cv")) / (col("nn") * col("cn")))
          .as("c"), (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("nvec")).as("nvec"), first(col("nn")).as("nn"),
        max(col("sc")).as("m"))
      .select(col("nid"), col("nvec"), col("nn"), (-col("m.nc")).as("cid"))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    val probes = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qvec"),
        norm(col("vec")).as("qn")))
      .crossJoin(cent)
      .select(col("qid"), col("qvec"), col("qn"), col("cid"),
        (dot(col("qvec"), col("cv")) / (col("qn") * col("cn"))).as("pcos"))
      .withColumn("prank", row_number().over(pw)).where(col("prank") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn"), col("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    probes.join(assigned, "cid").where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / (col("qn") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: candidates share at least one of
    * `bands` signature bands (`planes` bits split evenly); exact cosine
    * rank within candidates. Recall grows with bands; cost shrinks with
    * band width. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bands: Int = 4, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(planes, dim, seed)
    val perBand = planes / bands
    def withBands(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val bandCols = (0 until bands).map { b =>
        hyperplaneBucket(col("vec"),
          ps.slice(b * perBand, (b + 1) * perBand)).as(s"band$b")
      }
      df.select(Seq(col("id").as(idAs), col("vec").as(vecAs)) ++ bandCols: _*)
    }
    val q = broadcast(withBands(queries, "qid", "qvec"))
    val c = withBands(corpus, "nid", "nvec")
    val candidates = (0 until bands).map { b =>
      q.select(col("qid"), col("qvec"), col(s"band$b").as("bk"))
        .join(c.select(col("nid"), col("nvec"), col(s"band$b").as("bk")), "bk")
        .where(col("qid") =!= col("nid"))
        .select(col("qid"), col("qvec"), col("nid"), col("nvec"))
    }.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    candidates
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Product-quantization approximate top-k (Jégou et al. 2011) — the
    * embedding-STORE scale path next to IVF/LSH's search scale paths:
    * each vector is encoded as `m` one-byte-ish codes (one per
    * subspace), a 32×-ish compression, and queries score the whole
    * corpus through per-subspace lookup tables (ADC) without touching
    * the original floats.
    *
    * Codebooks are deterministic: the sampled rows (`id %
    * centroidEvery == 0`, lowest `codebookSize` ids) donate their
    * subvectors as centroids. This is the TRAIN/APPLY split every
    * production PQ uses: training collects the (tiny — |C|·dim longs)
    * codebook to the driver once; encoding is then a MAP-ONLY pass
    * through a native codegen'd kernel ([[graft.expressions
    * .PqEncodeExpr]]), one row in → m codes out, no join, no shuffle.
    * (The first cut encoded via an N·m·|C|-row join + min(struct) —
    * a struct-ordered aggregate Spark can only run as SortAggregate;
    * 244s for 40k vectors vs ~3s for the kernel.) Scoring = Σ_s
    * LUT[s, code_s] of integer dot products, so scores are pure
    * BIGINTs and ranks are bit-identical cross-engine.
    *
    * Plan shape at 100 TB: codebook train reads the sample only;
    * encode is map-only (this is the pass you'd persist as the N × m
    * byte store); the query LUT (|Q| × m × |C| longs) broadcasts into
    * one equi-join + partially-combined sum. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, centroidEvery: Int = 25,
      codebookSize: Int = 256): DataFrame = {
    val base = corpus.select(col("id"), quantize(col("vec")).as("q"))
    val ck = pqTrain(base, m, centroidEvery, codebookSize)
    // encode: one kernel call per row → (nid, s, code) map-only
    val codes = base.select(col("id").as("nid"),
      posexplode(graft.expressions.VectorExpressions
        .pqEncodeN(col("q"), m, ck.cids, ck.cb, ck.cb2)))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
    val cents = broadcast(pqCodebook(base, m, centroidEvery, codebookSize))
    adcScore(codes, cents, queries, m, k)
  }

  /** OPQ-style rotated PQ (Ge et al. 2013's optimized product
    * quantization, realized with the structured rotation production
    * systems substitute when a trained rotation is overkill — FAISS
    * `RandomRotationMatrix` / FALCONN pseudo-random rotations): both
    * corpus and queries pass through the integer-exact sign-flip +
    * Walsh–Hadamard rotation ([[graft.expressions.WhtRotateExpr]])
    * BEFORE codebook training, encoding and ADC scoring, so
    * per-subspace energy is balanced — the failure mode plain PQ has
    * on coordinate-correlated embeddings. Everything downstream is
    * [[pqTopK]]'s machinery verbatim (same train/apply split, same
    * map-only codegen encode, same broadcast LUT join); ranks remain
    * bit-identical cross-engine because the rotation is pure integer
    * arithmetic. `signs` is the ±1 diagonal (dimension must be a
    * power of two). */
  def rotatedPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      signs: IndexedSeq[Long], m: Int = 8, centroidEvery: Int = 25,
      codebookSize: Int = 256): DataFrame = {
    val rot = (df: DataFrame) => df.select(col("id"),
      graft.expressions.VectorExpressions
        .whtRotateN(quantize(col("vec")), signs).as("q"))
    val base = rot(corpus)
    val ck = pqTrain(base, m, centroidEvery, codebookSize)
    val codes = base.select(col("id").as("nid"),
      posexplode(graft.expressions.VectorExpressions
        .pqEncodeN(col("q"), m, ck.cids, ck.cb, ck.cb2)))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
    val cents = broadcast(pqCodebook(base, m, centroidEvery, codebookSize))
    adcScore(codes, cents, queries, m, k, prepare = rot)
  }

  /** (id, s, sub): each quantized vector exploded into its m
    * subvectors. Input must carry (id, q). */
  private[operators] def pqSubspaces(df: DataFrame, m: Int, idAs: String): DataFrame = {
    // integral division, matching PqEncodeExpr's `numElements / m`: the
    // Column `/` is Divide (DOUBLE), and for dim % m != 0 the truncated
    // `s * subDim + 1` starts drift from the kernel's integer slices,
    // silently corrupting ADC scores
    val subDim = floor(size(col("q")) / m).cast("int")
    df.select(col("id").as(idAs),
      posexplode(org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(m - 1)),
        s => slice(col("q"), s * subDim + 1, subDim))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "sub")
  }

  /** ADC scoring tail shared by [[pqTopK]], [[pqSearchStore]] and
    * [[rotatedPqTopK]]: broadcast the per-query lookup table (|Q| ×
    * m × |C| integer dots), equi-join the code rows, sum per
    * (query, neighbor), rank. `queries` carries raw (id, vec);
    * `prepare` maps it to the quantized-domain (id, q) — identity
    * quantize for plain PQ, quantize-then-rotate for OPQ. */
  private def adcScore(codes: DataFrame, cents: DataFrame,
      queries: DataFrame, m: Int, k: Int,
      prepare: DataFrame => DataFrame =
        df => df.select(col("id"), quantize(col("vec")).as("q"))): DataFrame = {
    val q = prepare(queries)
    val lut = broadcast(pqSubspaces(q, m, "qid").join(cents, "s")
      .select(col("qid"), col("s"), col("cid").as("code"),
        qdot(col("sub"), col("cv")).as("pdot")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid").asc)
    codes.join(lut, Seq("s", "code"))
      .where(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("pdot")).as("score"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Persist the PQ embedding store: `path/codes` = (id, codes
    * array<long>) — the N × m artifact, 32×-ish smaller than the
    * float vectors — and `path/codebook` = the trained sample's
    * quantized rows (id, q), from which search rebuilds the lookup
    * tables. The store is self-contained: [[pqSearchStore]] needs only
    * the path + the same m. */
  def pqWriteStore(corpus: DataFrame, path: String, m: Int = 8,
      centroidEvery: Int = 25, codebookSize: Int = 256): Unit = {
    val base = corpus.select(col("id"), quantize(col("vec")).as("q"))
    val ck = pqTrain(base, m, centroidEvery, codebookSize)
    base.where(col("id") % centroidEvery === 0)
      .orderBy(col("id")).limit(codebookSize)
      .write.mode("overwrite").parquet(s"$path/codebook")
    base.select(col("id"),
        graft.expressions.VectorExpressions
          .pqEncodeN(col("q"), m, ck.cids, ck.cb, ck.cb2).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Approximate top-k directly against a persisted [[pqWriteStore]]
    * — the original float vectors are never read. Bit-identical to
    * [[pqTopK]] over the same corpus and parameters. */
  def pqSearchStore(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, m: Int = 8): DataFrame = {
    val cents = broadcast(
      pqSubspaces(spark.read.parquet(s"$path/codebook"), m, "cid")
        .select(col("s"), col("cid"), col("sub").as("cv")))
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("id").as("nid"), posexplode(col("codes")))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
    adcScore(codes, cents, queries, m, k)
  }

  /** Driver-collected PQ codebook (the "train" half): flattened
    * per-subspace centroid subvectors + squared norms, ready to embed
    * in [[graft.expressions.PqEncodeExpr]]. Tiny by construction
    * (≤ codebookSize · dim longs) and deterministic (lowest sampled
    * ids, ascending). */
  private[graft] final case class TrainedPq(cids: IndexedSeq[Long],
      cb: IndexedSeq[Long], cb2: IndexedSeq[Long])

  /** Flatten collected (id, quantized vector) codebook rows into the
    * kernel's layout: cb[(s·|C| + c)·subDim + d] + per-(s,c) norms. */
  private[graft] def flattenCodebook(rows: Array[(Long, Seq[Long])],
      m: Int): TrainedPq = {
    require(rows.nonEmpty, "PQ codebook is empty")
    val sorted = rows.sortBy(_._1)
    val cids = sorted.map(_._1).toIndexedSeq
    val nC = cids.length
    val subDim = sorted.head._2.length / m
    val cb = new Array[Long](m * nC * subDim)
    val cb2 = new Array[Long](m * nC)
    for (s <- 0 until m; c <- 0 until nC) {
      var n2 = 0L
      var d = 0
      while (d < subDim) {
        val v = sorted(c)._2(s * subDim + d)
        cb((s * nC + c) * subDim + d) = v
        n2 += v * v
        d += 1
      }
      cb2(s * nC + c) = n2
    }
    TrainedPq(cids, cb.toIndexedSeq, cb2.toIndexedSeq)
  }

  private[operators] def pqTrain(base: DataFrame, m: Int, centroidEvery: Int,
      codebookSize: Int, sampleOffset: Int = 0): TrainedPq = {
    // orderBy+limit = TakeOrderedAndProject: the driver receives only
    // the codebook rows, never the full sample (which at planet scale
    // is corpus/centroidEvery rows — far too big to collect).
    // sampleOffset shifts the residue class — a residual IVF-PQ must
    // NOT train on the coarse-centroid rows, whose residuals are
    // identically zero (a degenerate all-zero codebook).
    val rows = base.where(col("id") % centroidEvery === sampleOffset)
      .select(col("id"), col("q"))
      .orderBy(col("id")).limit(codebookSize).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(rows.nonEmpty,
      s"PQ training sample is empty (no id % $centroidEvery == $sampleOffset rows)")
    flattenCodebook(rows, m)
  }

  /** The capped deterministic codebook as a broadcast FRAME (used for
    * the query-side ADC lookup table, where the relational form is the
    * convenient one): subvectors of the `codebookSize` LOWEST sampled
    * ids per subspace — the same selection [[pqTrain]] collects. The
    * cap runs BEFORE the subspace explode, as TakeOrderedAndProject
    * (all subspaces share the same ids, so a per-id cap = a per-(s,id)
    * cap — no per-subspace window needed). */
  private[operators] def pqCodebook(base: DataFrame, m: Int,
      centroidEvery: Int, codebookSize: Int): DataFrame =
    pqSubspaces(base.where(col("id") % centroidEvery === 0)
      .orderBy(col("id")).limit(codebookSize), m, "cid")
      .select(col("s"), col("cid"), col("sub").as("cv"))

  /** PQ reconstruction error — the quality gauge of the [[pqTopK]]
    * embedding store: per vector, the total integer squared-L2
    * distance between its quantized subvectors and the codebook
    * entries its codes point at (0 for codebook donors). Train once,
    * then ONE map-only kernel pass ([[graft.expressions.PqEncodeExpr]]
    * in err mode). Returns (id, err), both exact integers; when
    * dim % m != 0 the trailing unencoded dims are excluded on both
    * the vector and codebook side. */
  def pqReconstruction(corpus: DataFrame, m: Int = 8,
      centroidEvery: Int = 25, codebookSize: Int = 256): DataFrame = {
    val base = corpus.select(col("id"), quantize(col("vec")).as("q"))
    val ck = pqTrain(base, m, centroidEvery, codebookSize)
    base.select(col("id"),
      graft.expressions.VectorExpressions
        .pqEncodeN(col("q"), m, ck.cids, ck.cb, ck.cb2, err = true)
        .as("err"))
  }

  /** Integer-exact Lloyd k-means assignment over quantized embeddings
    * — the oracle-checkable sibling of [[kmeansCentroids]] (which runs
    * in double and is used for PQ training). Centroid state is the
    * (sum-vector S, member-count n) pair, never the float mean. The
    * per-centroid cost n²·⟨q,q⟩ − 2n·⟨q,S⟩ + ⟨S,S⟩ = ‖n·q − S‖²
    * equals n²·‖q − S/n‖² — a centroid-DEPENDENT scaling, so raw
    * costs of centroids with different member counts must NOT be
    * compared directly (that biases the argmin toward small
    * clusters). Assignment therefore compares the exact rationals
    * cost/n² by 128-bit cross-multiplication inside
    * [[graft.expressions.KmeansAssignExpr]] — the true
    * argmin_c ‖q − S_c/n_c‖², all-integer, ties → smallest cid, so a
    * DuckDB oracle (HUGEINT cross-multiply) reproduces every
    * assignment bit for bit and nothing depends on float summation
    * order.
    *
    * Scale: each iteration collects the ≤`centroidCap` compact
    * centroid state rows (a few KB — a bounded broadcast, the same
    * class as the IVF/PQ codebooks above), embeds them in the
    * codegen'd argmin kernel, and assigns MAP-ONLY: one compiled call
    * per row, no crossJoin row-multiplication, no per-id shuffle.
    * Sum recompute stays distributed via posexplode → per-(cid,dim)
    * partial aggregation. No driver loops over data. The int64 bound
    * holds while n²·⟨q,q⟩ < 2⁶³ and n ≤ 3.0e9 (n² must fit int64) —
    * at planet scale lower the quantization scale / raise the seed
    * density; the shape is unchanged. Empty cells drop, matching
    * standard Lloyd. Returns (id, cluster, n_members) after `iters`
    * assignment passes. */
  /** (id, q) projection shared by the Lloyd passes. */
  private def kmeansBase(corpus: DataFrame): DataFrame =
    corpus.select(col("id"), quantize(col("vec")).as("q"))

  /** Deterministic seed state: sampled ids as singleton clusters. */
  private def kmeansInit(corpus: DataFrame, every: Int,
      centroidCap: Int): DataFrame =
    corpus.where(col("id") % every === 0)
      .select(col("id").as("cid"), quantize(col("vec")).as("s"),
        lit(1L).as("n"))
      .orderBy(col("cid")).limit(centroidCap)

  /** Collected (cid, S, ⟨S,S⟩, n) arrays for the assignment kernel —
    * ≤centroidCap rows by construction, sorted by cid (the kernel's
    * tie-break contract). Fails loudly when the seed predicate
    * matched nothing (e.g. no id is a multiple of `every`) instead of
    * silently assigning nobody. */
  private def kmeansCollectState(cent: DataFrame): (IndexedSeq[Long],
      IndexedSeq[Long], IndexedSeq[Long], IndexedSeq[Long]) = {
    val rows = cent.select(col("cid"), col("s"), col("n")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "k-means centroid state is empty — no id " +
      "satisfied the seed predicate (id % every == 0); use a denser " +
      "`every` or check the id space")
    (rows.map(_._1).toIndexedSeq,
      rows.flatMap(_._2).toIndexedSeq,
      rows.map(r => r._2.map(x => x * x).sum).toIndexedSeq,
      rows.map(_._3).toIndexedSeq)
  }

  /** One assignment pass: map-only exact argmin over the collected
    * bounded state (no shuffle — the kernel is one compiled call per
    * row). */
  private def kmeansAssignStep(base: DataFrame,
      cent: DataFrame): DataFrame = {
    val (cids, sums, ss, ns) = kmeansCollectState(cent)
    base.withColumn("cid", graft.expressions.VectorExpressions
      .kmeansAssignN(col("q"), cids, sums, ss, ns))
  }

  /** Recompute (sum-vector, count) state from an assignment — ONE
    * pass over the assign-kernel output: the member count rides the
    * per-(cid, pos) aggregate (every member contributes one row per
    * dimension, so any dimension's group count IS the cell count),
    * where a separate count aggregate + join would re-run the
    * expensive argmin kernel a second time per Lloyd iteration.
    *
    * PRECONDITION (on [[kmeansBase]]'s quantize contract): every
    * member vector is FIXED-DIMENSION and NON-EMPTY — a member whose
    * quantized vector is empty or shorter than the rest would emit no
    * row for some `pos` and be silently dropped from `n`, diverging
    * from a groupBy(cid).count() and from the DuckDB oracle's exact
    * rational argmin. quantize preserves input dimension, so this
    * holds whenever the caller's embedding column is rectangular
    * (the table contract everywhere in this repo). */
  private def kmeansRecompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("q")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("col")).as("sv"), count(lit(1)).as("n0"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("sv")))),
        p => p.getField("sv")).as("s"),
        max(col("n0")).as("n"))

  /** State used by the FINAL assignment pass (iters−1 recomputes). */
  private def kmeansTrain(corpus: DataFrame, every: Int, iters: Int,
      centroidCap: Int): DataFrame = {
    val base = kmeansBase(corpus)
    var cent = kmeansInit(corpus, every, centroidCap)
    (1 until iters).foreach { _ =>
      cent = kmeansRecompute(kmeansAssignStep(base, cent))
    }
    cent
  }

  def kmeansAssignExact(corpus: DataFrame, every: Int = 25,
      iters: Int = 2, centroidCap: Int = 256): DataFrame = {
    val assigned = kmeansAssignStep(kmeansBase(corpus),
      kmeansTrain(corpus, every, iters, centroidCap))
    // cluster sizes via a cid-partitioned window count: ONE evaluation
    // of the final assign kernel and one exchange, where the separate
    // size aggregate + join re-ran the kernel over the whole corpus
    val w = Window.partitionBy(col("cid"))
    assigned.select(col("id"), col("cid"))
      .withColumn("n_members", count(lit(1)).over(w))
      .select(col("id"), col("cid").as("cluster"), col("n_members"))
  }

  /** Persist the trained Lloyd state — the train-once half of the
    * cross-snapshot clustering story (the same split as
    * [[pqWriteStore]]/[[pqSearchStore]]): the store holds the exact
    * (cid, sum-vector, count) state the batch's FINAL assignment pass
    * used, so [[kmeansAssignStore]] over the training corpus
    * reproduces [[kmeansAssignExact]]'s clusters bit for bit, and
    * tomorrow's increment is assigned under the identical model
    * without retraining or re-reading the corpus. */
  def kmeansWriteStore(corpus: DataFrame, path: String,
      every: Int = 25, iters: Int = 2, centroidCap: Int = 256): Unit =
    kmeansTrain(corpus, every, iters, centroidCap)
      .write.mode("overwrite").parquet(s"$path/centroids")

  /** Map-only assignment of (id, vec) rows against a persisted
    * [[kmeansWriteStore]]: the ≤centroidCap state rows are read once
    * driver-side and embedded in a codegen'd argmin kernel
    * ([[graft.expressions.KmeansAssignExpr]]) — one compiled call per
    * row, NO shuffle, no aggregation, so it runs identically over a
    * batch frame or a micro-batch stream. Returns (id, cluster). */
  def kmeansAssignStore(spark: org.apache.spark.sql.SparkSession,
      path: String, vectors: DataFrame): DataFrame = {
    val rows = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("s"), col("n")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"no centroid state at $path/centroids")
    val cids = rows.map(_._1).toIndexedSeq
    val sums = rows.flatMap(_._2).toIndexedSeq
    val ss = rows.map(r => r._2.map(x => x * x).sum).toIndexedSeq
    val ns = rows.map(_._3).toIndexedSeq
    vectors.select(col("id"),
      graft.expressions.VectorExpressions
        .kmeansAssignN(quantize(col("vec")), cids, sums, ss, ns)
        .as("cluster"))
  }

  /** Mutual k-NN graph over SRP-LSH candidate buckets — the edge set
    * semantic-cluster pipelines build on (mutual edges are the robust
    * ones: a hub vector that is top-k FOR many points but whose own
    * top-k excludes them contributes no edge). Candidates come from
    * the same (table, key) banded self-join as
    * [[graft.operators.Dedup.srpBlockedNearDup]] — an equi-join on
    * real keys, never all-pairs — scored by exact quantized cosine,
    * ranked per vector (ties → smallest neighbor id), and kept only
    * when BOTH endpoints rank each other ≤ k. Returns
    * (id_a < id_b, cos). */
  def mutualKnnGraph(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 3, nTables: Int = 4, bits: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
    val keyed = base.select(col("id"),
      posexplode(graft.expressions.VectorExpressions
        .srpKeysN(col("q"), nTables, bits)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "k")
    val ka = keyed.alias("a")
    val kb = keyed.alias("b")
    // candidates in canonical orientation only (src < dst): halves the
    // distinct, the two vector join-backs, and the cosine kernel calls
    // vs emitting both orders; the reverse direction is derived by
    // mirroring the scored half (cosine is symmetric)
    val pairs = ka
      .join(kb, col("a.t") === col("b.t") && col("a.k") === col("b.k"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst")).distinct()
    val v = base
      .withColumn("nrm", sqrt(qdot(col("q"), col("q")).cast("double")))
    // materialized once (the mirror union references it twice; without
    // the checkpoint both branches would re-run the scoring joins —
    // same lineage-cut precedent as Dedup.connectedComponents)
    val scoredHalf = pairs
      .join(v.select(col("id").as("src"), col("q").as("qa"),
        col("nrm").as("na")), "src")
      .join(v.select(col("id").as("dst"), col("q").as("qb"),
        col("nrm").as("nb")), "dst")
      .select(col("src"), col("dst"),
        (qdot(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb"))).as("cos"))
      .localCheckpoint()
    val scored = scoredHalf.unionByName(scoredHalf.select(
      col("dst").as("src"), col("src").as("dst"), col("cos")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    val topk = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
    val fwd = topk.where(col("src") < col("dst"))
      .select(col("src"), col("dst"), col("cos"))
    val bwd = topk.where(col("src") > col("dst"))
      .select(col("dst").as("src"), col("src").as("dst"))
    fwd.join(bwd, Seq("src", "dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"), col("cos"))
  }
}
