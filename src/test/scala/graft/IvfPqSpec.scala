package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IvfPqIndexStore, Similarity}

/** IVF-PQ (IVFADC): the composed store must prune like the IVF store,
  * score like the PQ ADC path, and recall the true neighbors on a
  * clustered fixture. */
class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  // clustered fixture: 4 well-separated direction clusters of 30
  // vectors each (+ small deterministic jitter), so coarse pruning is
  // informative and PQ codes preserve in-cluster ranking signal
  private def clustered = (0L until 120L).map { i =>
    val c = (i % 4).toInt
    val base = Array.tabulate(16)(d =>
      if (d / 4 == c) 10.0 else 0.3)
    (i, base.zipWithIndex.map { case (v, d) =>
      (v + 0.01 * math.sin(i * 1.7 + d)).toFloat }.toSeq)
  }.toDF("id", "vec")

  test("probe scores equal the full-corpus pqTopK ADC for shared pairs") {
    val path = Files.createTempDirectory("ivfpq").toString
    try {
      val corpus = clustered
      IvfPqIndexStore.write(corpus, path, centroidEvery = 10, m = 4)
      val queries = corpus.where($"id" < 3)
      val probed = IvfPqIndexStore.probe(spark, path, queries, k = 5,
        nprobe = 2, m = 4)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
        .map { case (q, n, s) => (q, n) -> s }.toMap
      // the IVFADC score of any surviving pair must be the EXACT ADC
      // integer pqTopK computes — pruning changes the candidate set,
      // never the arithmetic
      val full = Similarity.pqTopK(queries, corpus, k = 60,
        m = 4, centroidEvery = 10)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
        .map { case (q, n, s) => (q, n) -> s }.toMap
      assert(probed.nonEmpty)
      probed.foreach { case (pair, s) =>
        assert(full.get(pair).contains(s),
          s"pair $pair: ivfpq=$s pq=${full.get(pair)}")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("recall@5 vs brute-force cosine is high on the clustered fixture") {
    val path = Files.createTempDirectory("ivfpq").toString
    try {
      // the IVFADC operating regime: FEW coarse cells (stride 30 → 4
      // centroids, one per contiguous id-block cluster) and a DENSE
      // PQ codebook (every 2nd vector), with in-cluster variation
      // wide enough for PQ to rank. Recall is measured against the
      // metric ADC approximates — the exact quantized inner product —
      // so the measurement isolates quantization loss from the
      // IP-vs-cosine metric gap.
      import graft.functions.VectorFunctions.{qdot, quantize}
      val corpus = (0L until 120L).map { i =>
        val c = (i / 30).toInt
        (i, Array.tabulate(16) { d =>
          val base = if (d / 4 == c) 10.0 else 0.3
          (base + 0.8 * math.sin(i * 1.7 + d * 0.9)).toFloat
        }.toSeq)
      }.toDF("id", "vec")
      IvfPqIndexStore.write(corpus, path, centroidEvery = 30, m = 4,
        codebookEvery = 2)
      val queries = corpus.where($"id" < 8)
      val approx = IvfPqIndexStore.probe(spark, path, queries, k = 5,
        nprobe = 1, m = 4)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"s".desc, $"nid".asc)
      val exact = queries.select($"id".as("qid"), quantize($"vec").as("qv"))
        .crossJoin(corpus.select($"id".as("nid"), quantize($"vec").as("nv")))
        .where($"qid" =!= $"nid")
        .select($"qid", $"nid", qdot($"qv", $"nv").as("s"))
        .withColumn("rank", row_number().over(w)).where($"rank" <= 5)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      val recall = (approx & exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall@5 = $recall")
      // and the coarse stage alone must keep every neighbor in the
      // query's id-block cluster
      approx.foreach { case (q, n) =>
        assert(n / 30 == q / 30, s"cross-cluster neighbor $q -> $n")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("the cells scan is partition-pruned to the probed cells") {
    val path = Files.createTempDirectory("ivfpq").toString
    try {
      IvfPqIndexStore.write(clustered, path, centroidEvery = 10, m = 4)
      val v = IvfPqIndexStore.currentVersion(spark, path).get
      val nCells = new File(s"$path/v=$v/cells").listFiles()
        .count(_.getName.startsWith("cell="))
      assert(nCells > 2, s"fixture built only $nCells cells")
      val probe = IvfPqIndexStore.probe(spark, path,
        clustered.where($"id" === 1L), k = 3, nprobe = 1, m = 4)
      val scans = probe.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("cells")) => s
      }
      assert(scans.nonEmpty, "no file scan over the cells store found")
      val partsRead = scans.map { s =>
        val static = s.partitionFilters.filterNot(_.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .DynamicPruning]).isDefined)
        s.relation.location.listFiles(static, s.dataFilters).size
      }.sum
      assert(partsRead <= 1,
        s"probe listed $partsRead cell partitions, expected <= 1")
      assert(probe.count() > 0)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("exact refine reranks the ADC shortlist and lifts recall") {
    val pqPath = Files.createTempDirectory("ivfpq").toString
    val ivfPath = Files.createTempDirectory("ivfflat").toString
    try {
      import graft.functions.VectorFunctions.{qdot, quantize}
      val corpus = (0L until 120L).map { i =>
        val c = (i / 30).toInt
        (i, Array.tabulate(16) { d =>
          val base = if (d / 4 == c) 10.0 else 0.3
          (base + 0.8 * math.sin(i * 1.7 + d * 0.9)).toFloat
        }.toSeq)
      }.toDF("id", "vec")
      IvfPqIndexStore.write(corpus, pqPath, centroidEvery = 30, m = 4,
        codebookEvery = 4)
      graft.operators.IvfIndexStore.write(corpus, ivfPath,
        centroidEvery = 30)
      val queries = corpus.where($"id" < 8)
      def recallOf(pairs: Set[(Long, Long)]): Double = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
        val exact = queries
          .select($"id".as("qid"), quantize($"vec").as("qv"))
          .withColumn("qn",
            sqrt(qdot($"qv", $"qv").cast("double")))
          .crossJoin(corpus.select($"id".as("nid"),
            quantize($"vec").as("nv"))
            .withColumn("nn", sqrt(qdot($"nv", $"nv").cast("double"))))
          .where($"qid" =!= $"nid")
          .select($"qid", $"nid",
            (qdot($"qv", $"nv").cast("double") / ($"qn" * $"nn")).as("cos"))
          .withColumn("r", row_number().over(w)).where($"r" <= 5)
          .select($"qid", $"nid").as[(Long, Long)].collect().toSet
        (pairs & exact).size.toDouble / exact.size
      }
      val adc = IvfPqIndexStore.probe(spark, pqPath, queries, k = 5,
        nprobe = 1, m = 4)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      val refined = IvfPqIndexStore.probeRerank(spark, pqPath, ivfPath,
        queries, k = 5, rerank = 25, nprobe = 1, m = 4)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      val (rAdc, rRef) = (recallOf(adc), recallOf(refined))
      // with a deliberately coarse codebook (every 4th vector) the raw
      // ADC ranking is lossy; the exact rescore of its top-25 must
      // recover the true cosine ranking
      assert(rRef >= rAdc, s"refine lowered recall: adc=$rAdc ref=$rRef")
      assert(rRef >= 0.9, s"refined recall@5 = $rRef (adc = $rAdc)")
      // refined scores are the EXACT quantized cosine (the IVF store's
      // arithmetic), deterministic ranks
      val again = IvfPqIndexStore.probeRerank(spark, pqPath, ivfPath,
        queries, k = 5, rerank = 25, nprobe = 1, m = 4)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      assert(again == refined)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(pqPath))
      org.apache.commons.io.FileUtils.deleteDirectory(new File(ivfPath))
    }
  }

  test("reconstructed rerank: cosine from the PQ store alone, between ADC and flat") {
    val path = Files.createTempDirectory("ivfpqrc").toString
    try {
      import graft.functions.VectorFunctions.{qdot, quantize}
      val corpus = (0L until 120L).map { i =>
        val c = (i / 30).toInt
        (i, Array.tabulate(16) { d =>
          val base = if (d / 4 == c) 10.0 else 0.3
          (base + 0.8 * math.sin(i * 1.7 + d * 0.9)).toFloat
        }.toSeq)
      }.toDF("id", "vec")
      IvfPqIndexStore.write(corpus, path, centroidEvery = 30, m = 4,
        codebookEvery = 4)
      val queries = corpus.where($"id" < 8)
      val recon = IvfPqIndexStore.probeRerankReconstructed(spark, path,
        queries, k = 5, rerank = 25, nprobe = 1, m = 4)
        .select($"qid", $"nid", $"cos")
        .as[(Long, Long, Double)].collect()
      assert(recon.map(_._1).distinct.length == 8)
      // the reported cosine must be the EXACT reconstructed cosine:
      // recompute it independently — codes via the same deterministic
      // codebook argmin, norm from the codebook entries
      val m = 4
      val base = corpus.select($"id", quantize($"vec").as("q"))
      val rows = base.where($"id" % 4 === 0)
        .orderBy($"id").limit(256).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      val cb = rows.sortBy(_._1)
      val subDim = cb.head._2.length / m
      def codesOf(q: Seq[Long]): Seq[Int] = (0 until m).map { s =>
        cb.indices.minBy { c =>
          (0 until subDim).map { d =>
            val diff = q(s * subDim + d) - cb(c)._2(s * subDim + d)
            diff * diff
          }.sum
        }
      }
      val vecs = base.as[(Long, Seq[Long])].collect().toMap
      recon.foreach { case (qid, nid, cos) =>
        val qv = vecs(qid); val nc = codesOf(vecs(nid))
        val dot = (0 until m).flatMap(s => (0 until subDim).map(d =>
          qv(s * subDim + d) * cb(nc(s))._2(s * subDim + d))).sum
        val rn2 = (0 until m).flatMap(s => (0 until subDim).map { d =>
          val v = cb(nc(s))._2(s * subDim + d); v * v
        }).sum
        val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
        val expect = dot / (qn * math.sqrt(rn2.toDouble))
        assert(math.abs(cos - expect) < 1e-12,
          s"($qid,$nid): got $cos expect $expect")
      }
      // determinism
      val again = IvfPqIndexStore.probeRerankReconstructed(spark, path,
        queries, k = 5, rerank = 25, nprobe = 1, m = 4)
        .select($"qid", $"nid", $"cos")
        .as[(Long, Long, Double)].collect()
      assert(again.toSet == recon.toSet)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("by_residual index: exact scoring identity from the artifacts") {
    import graft.functions.VectorFunctions.quantize
    val resPath = Files.createTempDirectory("ivfpqres").toString
    try {
      IvfPqIndexStore.write(clustered, resPath, byResidual = true)
      val queries = clustered.where($"id" < 6)
      val q = clustered.select($"id", quantize($"vec").as("q"))
        .as[(Long, Seq[Long])].collect().toMap
      val v = IvfPqIndexStore.currentVersion(spark, resPath)
        .getOrElse(fail("no committed version"))
      // the stored artifacts, read back raw
      val cb = spark.read.parquet(s"$resPath/v=$v/codebook")
        .select($"id", $"q").as[(Long, Seq[Long])].collect().toMap
      val cents = spark.read.parquet(s"$resPath/v=$v/centroids")
        .select($"cid", $"cv").as[(Long, Seq[Long])].collect().toMap
      val cells = spark.read.parquet(s"$resPath/v=$v/cells")
        .select($"nid", $"codes", $"cell".cast("long"))
        .as[(Long, Seq[Long], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // degeneracy guard: residual codebook rows must NOT all be the
      // zero vector (residue class 1 avoids the centroid rows)
      assert(cb.values.exists(_.exists(_ != 0L)),
        "residual codebook degenerated to zeros")
      // identity: probe score == ⟨q, centroid(cell)⟩ + Σ_s ⟨q_s, cb[code_s]⟩
      val got = IvfPqIndexStore.probe(spark, resPath, queries, k = 50)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
      assert(got.nonEmpty)
      val m = 8
      got.foreach { case (qid, nid, score) =>
        val (codes, cell) = cells(nid)
        val qq = q(qid)
        val subDim = qq.length / m
        val qc = qq.zip(cents(cell)).map(p => p._1 * p._2).sum
        val lutSum = (0 until m).map { s =>
          val cw = cb(codes(s))
          (0 until subDim).map(d =>
            qq(s * subDim + d) * cw(s * subDim + d)).sum
        }.sum
        assert(score == qc + lutSum, s"($qid,$nid)")
      }
      // the reconstructed rerank's norm identity assumes absolute
      // codes — it must refuse a residual index loudly
      val e = intercept[Exception] {
        IvfPqIndexStore.probeRerankReconstructed(
          spark, resPath, queries, k = 3).collect()
      }
      assert(e.getMessage.contains("by_residual"))
      // the flat-store exact refine still composes with it
      val ivfPath = Files.createTempDirectory("ivfflat").toString
      try {
        graft.operators.IvfIndexStore.write(clustered, ivfPath)
        val rr = IvfPqIndexStore.probeRerank(spark, resPath, ivfPath,
          queries, k = 3, rerank = 10)
        assert(rr.count() == 6 * 3)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new File(ivfPath))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(resPath))
  }

  test("probe m must match the index's written m (or derive from it)") {
    val path = Files.createTempDirectory("ivfpqm").toString
    try {
      IvfPqIndexStore.write(clustered, path, centroidEvery = 10, m = 4)
      val queries = clustered.where($"id" < 3)
      // wrong m: loud failure, never silently mis-sliced ADC scores
      val e = intercept[Exception] {
        IvfPqIndexStore.probe(spark, path, queries, k = 3, nprobe = 2,
          m = 8).collect()
      }
      assert(e.getMessage.contains("m=8") &&
        e.getMessage.contains("index m=4"), e.getMessage)
      // omitted m: derived from the store's params record
      val derived = IvfPqIndexStore.probe(spark, path, queries, k = 3,
        nprobe = 2)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect().toSet
      val explicit = IvfPqIndexStore.probe(spark, path, queries, k = 3,
        nprobe = 2, m = 4)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect().toSet
      assert(derived == explicit && derived.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("a rewrite serves atomically: old index until commit, then new") {
    val path = Files.createTempDirectory("ivfpq").toString
    try {
      val a = clustered
      IvfPqIndexStore.write(a, path, centroidEvery = 10, m = 4)
      val queries = a.where($"id" < 3)
      val before = IvfPqIndexStore.probe(spark, path, queries, k = 3,
        nprobe = 2, m = 4)
        .select($"qid", $"nid", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      // second write over the same path: probes stay deterministic;
      // the superseded version is RETAINED for in-flight readers
      // (reader-safe GC), a third write ages it out — never more
      // than two versions on disk
      IvfPqIndexStore.write(a, path, centroidEvery = 10, m = 4)
      val after = IvfPqIndexStore.probe(spark, path, queries, k = 3,
        nprobe = 2, m = 4)
        .select($"qid", $"nid", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(after == before)
      assert(new File(path).listFiles()
        .count(_.getName.startsWith("v=")) == 2)
      IvfPqIndexStore.write(a, path, centroidEvery = 10, m = 4)
      assert(new File(path).listFiles()
        .count(_.getName.startsWith("v=")) == 2)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }
}
