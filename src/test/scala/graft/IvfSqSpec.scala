package graft

import java.io.File
import java.nio.file.Files

import graft.operators.{IvfSqIndexStore, SqIndexStore}

/** IVF-SQ8 store: the coarse restriction is the ONLY delta vs the
  * flat SQ8 store (scores bit-equal on shared candidates), the cells
  * layout partition-prunes, the versioned protocol holds, and the
  * exact refine rescores with the true quantized cosine. */
class IvfSqSpec extends SparkSpecBase {
  import spark.implicits._

  // 120 vectors, 6 dims — enough ids divisible by 25 for 4 centroids
  private def vecs = (1L to 120L).map { i =>
    (i, (0 until 6).map(d =>
      math.sin(i * 0.37 + d * 1.13).toFloat).toArray.toSeq)
  }.toDF("id", "vec")

  test("probe scores equal the flat SQ8 scores on shared candidates") {
    val ivfPath = Files.createTempDirectory("ivfsq").toString
    val sqPath = Files.createTempDirectory("sqflat").toString
    try {
      IvfSqIndexStore.write(vecs, ivfPath)
      SqIndexStore.write(vecs, sqPath)
      val queries = vecs.where($"id" < 6)
      // k large enough to keep every probed-cell candidate
      val ivf = IvfSqIndexStore.probe(spark, ivfPath, queries, k = 200)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
      val flat = SqIndexStore.probe(spark, sqPath, queries, k = 200)
        .select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
        .map { case (q, n, s) => (q, n) -> s }.toMap
      assert(ivf.nonEmpty)
      // identical SQ8 arithmetic: every IVF candidate's score matches
      // the flat store's score for the same pair bit for bit
      ivf.foreach { case (q, n, s) =>
        assert(s == flat((q, n)), s"score mismatch at ($q,$n)")
      }
      // and the coarse restriction is real: fewer candidates than flat
      assert(ivf.length < flat.size)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(ivfPath))
      org.apache.commons.io.FileUtils.deleteDirectory(new File(sqPath))
    }
  }

  test("cells are laid out for partition pruning; protocol versions") {
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      IvfSqIndexStore.write(vecs, path)
      val dirs = new File(path).listFiles().map(_.getName).toSet
      assert(dirs == Set("v=1", "v=2"), dirs.toString)
      assert(new File(s"$path/v=2/_COMMITTED").exists())
      assert(new File(s"$path/v=2/params.json").exists())
      val cellDirs = new File(s"$path/v=2/cells").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
        cellDirs.mkString(","))
      // multiple Voronoi cells actually populated (pruning has teeth)
      assert(cellDirs.length > 1, cellDirs.mkString(","))
      val r = IvfSqIndexStore.probe(spark, path,
        vecs.where($"id" === 1L), k = 3).count()
      assert(r == 3)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("a mismatched query dimension fails loudly, never zip-truncates") {
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      val narrow = Seq((1L, Seq(0.5f, -0.5f))).toDF("id", "vec")
      val e = intercept[Exception] {
        IvfSqIndexStore.probe(spark, path, narrow, k = 3).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("query dim")), msgs(e).toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("exact refine rescores the shortlist with the true cosine") {
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      val queries = vecs.where($"id" < 4)
      val got = IvfSqIndexStore.probeRerank(spark, path, vecs, queries,
        k = 3, rerank = 10)
        .select($"qid", $"nid", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect()
      assert(got.length == 3 * 3)
      val q = vecs.as[(Long, Seq[Float])].collect().map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000)).toArray
      }.toMap
      got.foreach { case (qid, nid, cos, _) =>
        val (a, b) = (q(qid), q(nid))
        val dot = a.indices.map(d => a(d) * b(d)).sum.toDouble
        val want = dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble))
        assert(math.abs(cos - want) < 1e-12, s"($qid,$nid)")
      }
      got.groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(_._4).map(_._3)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("encodeFrozen reproduces the batch write's cells bit for bit") {
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      val v = IvfSqIndexStore.currentVersion(spark, path)
        .getOrElse(fail("no committed version"))
      val stored = spark.read.parquet(s"$path/v=$v/cells")
        .select($"nid", $"codes", $"cell".cast("long"))
        .as[(Long, Seq[Long], Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val frozen = IvfSqIndexStore.encodeFrozen(spark, path, vecs)
        .select($"nid", $"codes", $"cell")
        .as[(Long, Seq[Long], Long)].collect()
      assert(frozen.length == stored.size)
      frozen.foreach { case (nid, codes, cell) =>
        assert(stored(nid) == ((codes, cell)), s"nid $nid")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("streaming ingest lands in the frozen cells the probe reads") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      val v = IvfSqIndexStore.currentVersion(spark, path)
        .getOrElse(fail("no committed version"))
      val twin = vecs.where($"id" === 10L)
        .as[(Long, Seq[Float])].head()._2
      val input = MemoryStream[(Long, Seq[Float])]
      val encoded = graft.streaming.Streams.ivfSqEncodeStream(spark,
        input.toDS().toDF("id", "vec"), path)
      val q = encoded.writeStream.outputMode("append")
        .partitionBy("cell")
        .format("parquet").option("path", s"$path/v=$v/cells")
        .option("checkpointLocation", s"$path/ckpt").start()
      input.addData((1000L, twin))
      q.processAllAvailable()
      q.stop()
      // the twin shares vector 10's codes AND cell exactly, so it
      // must surface in 10's top hits through the partition-pruned
      // probe
      val hits = IvfSqIndexStore.probe(spark, path,
          vecs.where($"id" === 10L), k = 3)
        .select($"nid").as[Long].collect().toSet
      assert(hits.contains(1000L), hits.toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("a zero vector is refused loudly in batch AND frozen paths") {
    // a zero-norm vector has no cosine cell: the batch write's ANSI
    // double division throws on it, and the codegen'd frozen-path
    // kernel must refuse identically — the silent alternative would
    // park streamed zero vectors in a sentinel cell no probe reads
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      val zero = Seq((500L, Seq.fill(6)(0.0f))).toDF("id", "vec")
      intercept[Exception] {
        IvfSqIndexStore.write(vecs.union(zero), path)
      }
      IvfSqIndexStore.write(vecs, path)
      val e = intercept[Exception] {
        IvfSqIndexStore.encodeFrozen(spark, path, zero).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("zero-norm")), msgs(e).toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("every probe score is within the provable quantization bound") {
    val path = Files.createTempDirectory("ivfsq").toString
    try {
      IvfSqIndexStore.write(vecs, path)
      val queries = vecs.where($"id" < 9)
      // code_d = round(255(x_d−min_d)/span_d) is off by ≤ 1/2, so the
      // 255-scaled reconstruction dot satisfies the DETERMINISTIC
      // bound |score − 255·⟨q,x⟩| ≤ Σ_d |q_d|·span_d / 2 — the exact
      // fidelity contract of the 8-bit tier (this fixture packs 120
      // points on a smooth 2-plane curve, so top-1 recall is a
      // near-tie coin flip; the bound is what the operator owes)
      val got = IvfSqIndexStore.probe(spark, path, queries, k = 200,
        nprobe = 4).select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
      assert(got.nonEmpty)
      val q = vecs.as[(Long, Seq[Float])].collect().map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000)).toArray
      }.toMap
      val dim = q.head._2.length
      val mins = (0 until dim).map(d => q.values.map(_(d)).min)
      val spans = (0 until dim).map(d => q.values.map(_(d)).max - mins(d))
      got.foreach { case (qid, nid, s) =>
        val exact = (0 until dim).map(d =>
          255L * q(qid)(d) * q(nid)(d)).sum
        val bound = (0 until dim).map(d =>
          math.abs(q(qid)(d)) * spans(d)).sum / 2.0 + dim
        assert(math.abs(s - exact) <= bound,
          s"($qid,$nid): |$s - $exact| > $bound")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }
}
