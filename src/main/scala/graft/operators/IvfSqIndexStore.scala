package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF-SQ8 — coarse Voronoi cells whose payload is scalar-quantized
  * codes: the FAISS `IndexIVFScalarQuantizer(QT_8bit)` tier, the
  * most-deployed production middle ground between [[IvfIndexStore]]
  * (cells of exact vectors: full IO, full recall) and
  * [[IvfPqIndexStore]] (cells of product codes: deepest compression,
  * lossiest). A probe is sublinear (reads only the probed cell
  * directories) AND 4× lighter per candidate than the exact-vector
  * IVF scan, at far better recall than PQ.
  *
  * Semantics (FAISS `by_residual = false` form — codes quantize the
  * RAW vectors against the corpus-global per-dimension ranges, not
  * the residual to the centroid; the residual form is a different
  * accuracy/complexity trade the flat [[SqIndexStore]] docs discuss):
  *   - coarse: the same deterministic centroid sample and
  *     argmax-cosine assignment as [[IvfIndexStore]];
  *   - payload: the same affine 8-bit codes and exact-integer
  *     reconstruction scoring as [[SqIndexStore]] —
  *     255·⟨q, recon⟩ = 255·⟨q, min⟩ + ⟨q∘span, code⟩, so probe
  *     scores are bit-equal to the flat SQ8 probe restricted to the
  *     probed cells (spec'd), and the q134 oracle recomputes the
  *     whole route in SQL.
  *
  * Layout under the shared [[VersionedStore]] crash-safe protocol:
  *   - `v=N/centroids` — (cid, cv, cn), ≤ centroidCap rows;
  *   - `v=N/stats` — (s, mn, span) per dimension;
  *   - `v=N/cells/cell=K/` — (nid, codes array<long>), salted across
  *     `writeSplits` writer tasks per cell (hot-cell fan-out, same
  *     rationale as [[IvfIndexStore.write]]);
  *   - `v=N/params.json` — trained dim; probes validate query width
  *     against it instead of silently zip-truncating.
  *
  * Scale: write is one corpus pass (argmax assignment collapses the
  * |corpus|×|C| broadcast expansion to one row per vector before the
  * partitioned write; the SQ stats shuffle carries dim rows per map
  * partition). Probe reads ~nprobe/|C| of the codes — and the codes
  * are 1/4 the bytes of the exact-vector cells — with the usual
  * bounded ≤ Q·nprobe probed-cell driver list and per-query top-k
  * window.
  *
  * Reference for semantics: FAISS IndexIVFScalarQuantizer (public
  * docs/paper — Johnson, Douze, Jégou, "Billion-scale similarity
  * search with GPUs", 2017); re-expressed as declarative Spark plans.
  */
object IvfSqIndexStore {

  private[graft] def currentVersion(spark: SparkSession,
      path: String): Option[Long] =
    VersionedStore.currentVersion(spark, path)

  // stats/params layout and guards are SqIndexStore's, shared
  private def statsOf(spark: SparkSession,
      vdir: String): (Array[Long], Array[Long]) =
    SqIndexStore.statsOf(spark, vdir)

  private def storedDim(spark: SparkSession, vdir: String): Int =
    SqIndexStore.storedDim(spark, vdir, "IvfSqIndexStore")

  /** Train coarse + scalar quantizers, assign, encode, store. One
    * corpus pass for the assignment/encode (the stats pass carries
    * dim rows per partition after partial aggregation). */
  def write(corpus: DataFrame, path: String,
      centroidEvery: Int = 25, centroidCap: Int = 256,
      writeSplits: Int = 8): Unit = {
    val spark = corpus.sparkSession
    require(corpus.isEmpty ||
      !corpus.where(col("id") % centroidEvery === 0).isEmpty,
      s"IVF centroid sample is empty (no id % $centroidEvery == 0 rows)")
    val (current, next) = VersionedStore.prepareStage(spark, path)
    val vdir = s"$path/v=$next"

    val base = corpus.select(col("id").as("nid"),
      quantize(col("vec")).as("q"))
    // per-dimension affine ranges — identical training rule to
    // SqIndexStore.write (global, not per-cell: by_residual=false)
    val stats = base.select(posexplode(col("q")).as(Seq("s", "x")))
      .groupBy(col("s"))
      .agg(min(col("x")).as("mn"),
        (max(col("x")) - min(col("x"))).as("span"))
    val st = stats.orderBy("s").collect() // bounded by the embedding dim
    require(st.nonEmpty, "IvfSqIndexStore: empty corpus")
    val dim = st.length
    val mins = st.map(_.getLong(1))
    val spans = st.map(_.getLong(2))

    val cent = broadcast(corpus
      .where(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), quantize(col("vec")).as("cv"))
      .orderBy(col("cid")).limit(centroidCap)
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double"))))
    val corp = base
      .withColumn("nn", sqrt(qdot(col("q"), col("q")).cast("double")))
    // argmax-by-struct (IvfIndexStore pattern): one row per vector
    // leaves the broadcast expansion; the SQ encode happens AFTER the
    // collapse, in the partitioned-write projection
    val assigned = corp.crossJoin(cent)
      .select(col("nid"), col("q"), col("nn"),
        struct((qdot(col("q"), col("cv")).cast("double") /
            (col("nn") * col("cn"))).as("c"),
          (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("q")).as("q"), max(col("sc")).as("m"))
      .select(col("nid"), col("q"), (-col("m.nc")).as("cell"))
    assigned
      .withColumn("salt", pmod(xxhash64(col("nid")), lit(writeSplits)))
      .repartition(col("cell"), col("salt"))
      .sortWithinPartitions("cell", "nid")
      .select(col("nid"),
        expr(SqIndexStore.encodeSql(mins, spans)).as("codes"),
        col("cell"))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$vdir/cells")
    cent.select(col("cid"), col("cv"), col("cn"))
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/centroids")
    // persist the already-collected stats rows (see SqIndexStore
    // .write: re-executing `stats` would re-scan the corpus)
    SqIndexStore.writeStats(spark, vdir, st)
    VersionedStore.writeText(spark, s"$vdir/params.json",
      s"""{"dim":$dim,"bits":8}""")
    VersionedStore.commitMarker(spark, vdir)
    VersionedStore.gcPrevious(spark, path, current)
  }

  /** Encode + assign vectors under the FROZEN serving version — the
    * ingest half of a train-once IVF-SQ8 store: the ≤centroidCap
    * coarse centroids are read once driver-side and embedded in a
    * codegen'd argmax-cosine kernel
    * ([[graft.expressions.IvfAssignExpr]], bit-equal to [[write]]'s
    * struct-max assignment), and the SQ8 codes clamp to the frozen
    * ranges like [[SqIndexStore.encodeFrozen]]. Stateless per-row
    * projection, NO shuffle — runs identically over a batch frame or
    * a micro-batch stream ([[graft.streaming.Streams
    * .ivfSqEncodeStream]]). Returns (nid, codes, cell); append the
    * rows under the serving version's `cells/cell=K` partitions and
    * the next probe sees them. */
  def encodeFrozen(spark: SparkSession, path: String,
      vectors: DataFrame): DataFrame = {
    val vdir = VersionedStore.servingDir(spark, path, "IvfSqIndexStore")
    val dim = storedDim(spark, vdir)
    val (mins, spans) = statsOf(spark, vdir)
    val cent = spark.read.parquet(s"$vdir/centroids")
      .select(col("cid"), col("cv"), col("cn")).collect()
      .sortBy(_.getLong(0))
    require(cent.nonEmpty, s"no centroids at $vdir/centroids")
    val cids = cent.map(_.getLong(0)).toIndexedSeq
    val cvs = cent.flatMap(_.getSeq[Long](1)).toIndexedSeq
    val cns = cent.map(_.getDouble(2)).toIndexedSeq
    vectors.select(col("id").as("nid"), quantize(col("vec")).as("q"))
      .withColumn("q",
        SqIndexStore.dimChecked("q", dim, "IvfSqIndexStore", "vector"))
      .select(col("nid"),
        expr(SqIndexStore.encodeSql(mins, spans)).as("codes"),
        graft.expressions.VectorExpressions
          .ivfAssignN(col("q"), cids, cvs, cns).as("cell"))
  }

  /** Serve a probe batch: rank the broadcast centroids per query,
    * read ONLY the probed cell partitions, score candidates by the
    * exact integer reconstruction dot 255·⟨q, recon(codes)⟩, top-k
    * with (score desc, nid asc) tie-breaks. Returns
    * (qid, nid, score BIGINT, rank). */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid").asc)
    probeCandidates(spark, path, queries, nprobe)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The unranked probe stage (shared by [[probe]] and
    * [[probeRerank]]): every (query, candidate) pair in the probed
    * cells with its SQ8 reconstruction score. */
  private def probeCandidates(spark: SparkSession, path: String,
      queries: DataFrame, nprobe: Int): DataFrame = {
    val vdir = VersionedStore.servingDir(spark, path, "IvfSqIndexStore")
    val dim = storedDim(spark, vdir)
    val (mins, spans) = statsOf(spark, vdir)
    val cent = broadcast(spark.read.parquet(s"$vdir/centroids"))
    val minsL = typedlit(mins.toSeq)
    val spansL = typedlit(spans.toSeq)
    // one broadcast probe set carrying BOTH the coarse-ranking pieces
    // (qv, qn) and the SQ8 scoring pieces (qs = q∘span, qmin = ⟨q,min⟩)
    val q = broadcast(queries
      .select(col("id").as("qid"), quantize(col("vec")).as("qv"))
      .withColumn("qv",
        SqIndexStore.dimChecked("qv", dim, "IvfSqIndexStore", "query"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double")))
      .withColumn("qs", zip_with(col("qv"), spansL, (a, b) => a * b))
      .withColumn("qmin", qdot(col("qv"), minsL)))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    // broadcast survives the crossJoin+window (same hint as
    // IvfPqIndexStore.pruned): without it the ≤|Q|·nprobe probe set
    // can plan as the shuffle side of a sort-merge join, shuffling
    // every probed-cell code row
    // materialized once (≤ |queries| · nprobe rows): the pruning
    // collect and the cells join would otherwise each re-run the
    // crossJoin + ranking window
    val probes = broadcast(q.crossJoin(cent)
      .select(col("qid"), col("qs"), col("qmin"), col("cid"),
        (qdot(col("qv"), col("cv")).cast("double") /
          (col("qn") * col("cn"))).as("pcos"))
      .withColumn("prank", row_number().over(pw))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("qs"), col("qmin"), col("cid"))
      .localCheckpoint())
    // bounded driver list (≤ |queries| · nprobe): the literal IN
    // filter turns the cells read into partition pruning
    val probedCells = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0))
    // probed dirs only — see VersionedStore.readProbedCells
    val cells = VersionedStore
      .readProbedCells(spark, s"$vdir/cells", probedCells)
      .getOrElse(spark.read.parquet(s"$vdir/cells")
        .where(col("cell").cast("long").isInCollection(probedCells)))
      .select(col("nid"), col("codes"), col("cell").cast("long").as("cell"))
    probes.join(cells, probes("cid") === cells("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (col("qmin") * 255 + qdot(col("qs"), col("codes"))).as("score"))
  }

  /** SQ8-shortlist + exact refine over the probed cells
    * (`IndexRefineFlat` over the IVF-SQ base): the compressed probe
    * shortlists `rerank` candidates per query, then ONLY those are
    * rescored with the exact quantized cosine against the
    * full-precision corpus — a semi-join fetch of ≤ R rows per query.
    * Returns (qid, nid, cos, rank). */
  def probeRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int = 20,
      nprobe: Int = 2): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must be >= k $k")
    val shortlist = probe(spark, path, queries, k = rerank, nprobe)
      .select(col("qid"), col("nid"))
    SqIndexStore.rerankExact(shortlist, corpus, queries, k)
  }
}
