package graft

import java.io.File
import java.nio.file.Files

import graft.operators.SqIndexStore

/** SQ8 scalar-quantization store: exact-integer scoring against an
  * independent Scala recomputation, the versioned-store protocol
  * (commit marker, reader-safe GC), params validation, and the
  * exact-refine recall lift. */
class SqIndexStoreSpec extends SparkSpecBase {
  import spark.implicits._

  // 60 vectors, 6 dims, deterministic spread; values ±1 so the
  // 1000-scaled quantization covers the full code range
  private def vecs = (1L to 60L).map { i =>
    (i, (0 until 6).map(d =>
      math.sin(i * 0.41 + d * 1.07).toFloat).toArray.toSeq)
  }.toDF("id", "vec")

  /** The store's arithmetic, recomputed from scratch on the driver:
    * 1000-scale quantize, per-dim min/span, round-half-up codes,
    * score = 255·⟨q,min⟩ + ⟨q∘span, code⟩. */
  private def bruteScores(
      rows: Seq[(Long, Seq[Float])]): Map[(Long, Long), Long] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)).toArray
    }.toMap
    val dim = q.head._2.length
    val mins = (0 until dim).map(d => q.values.map(_(d)).min).toArray
    val spans = (0 until dim).map(d => q.values.map(_(d)).max - mins(d))
      .toArray
    val codes = q.map { case (id, v) =>
      id -> (0 until dim).map { d =>
        if (spans(d) == 0) 0L
        else ((v(d) - mins(d)) * 510 + spans(d)) / (2 * spans(d))
      }.toArray
    }
    (for {
      (qid, qv) <- q.toSeq; if qid < 6
      (nid, c) <- codes.toSeq; if nid != qid
    } yield (qid, nid) -> (0 until dim).map(d =>
      qv(d) * (255 * mins(d) + c(d) * spans(d))).sum).toMap
  }

  test("probe scores are the exact integer reconstruction dots") {
    val path = Files.createTempDirectory("sqidx").toString
    try {
      SqIndexStore.write(vecs, path)
      val got = SqIndexStore.probe(spark, path, vecs.where($"id" < 6),
        k = 60).select($"qid", $"nid", $"score")
        .as[(Long, Long, Long)].collect()
      val want = bruteScores(vecs.as[(Long, Seq[Float])].collect().toSeq)
      assert(got.nonEmpty)
      got.foreach { case (qid, nid, s) =>
        assert(s == want((qid, nid)), s"score mismatch at ($qid,$nid)")
      }
      // full coverage: k=60 over 59 candidates returns them all
      assert(got.length == 5 * 59)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("versioned protocol: rewrite serves v2, retains v1, GCs older") {
    val path = Files.createTempDirectory("sqidx").toString
    try {
      SqIndexStore.write(vecs, path)
      SqIndexStore.write(vecs, path)
      SqIndexStore.write(vecs, path)
      val dirs = new File(path).listFiles().map(_.getName).toSet
      // steady state two versions (reader-safe GC), serving the last
      assert(dirs == Set("v=2", "v=3"), dirs.toString)
      assert(new File(s"$path/v=3/_COMMITTED").exists())
      assert(new File(s"$path/v=3/params.json").exists())
      val r = SqIndexStore.probe(spark, path, vecs.where($"id" === 1L),
        k = 3).count()
      assert(r == 3)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("a mismatched query dimension fails loudly, never zip-truncates") {
    val path = Files.createTempDirectory("sqidx").toString
    try {
      SqIndexStore.write(vecs, path)
      val narrow = Seq((1L, Seq(0.5f, -0.5f))).toDF("id", "vec")
      val e = intercept[Exception] {
        SqIndexStore.probe(spark, path, narrow, k = 3).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("query dim")), msgs(e).toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("exact refine reranks by true cosine and k-bounds the output") {
    val path = Files.createTempDirectory("sqidx").toString
    try {
      SqIndexStore.write(vecs, path)
      val queries = vecs.where($"id" < 4)
      val got = SqIndexStore.probeRerank(spark, path, vecs, queries,
        k = 3, rerank = 10)
        .select($"qid", $"nid", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect()
      assert(got.length == 3 * 3)
      // every reported cosine is the exact quantized cosine
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
      // within each query the ranks follow cosine desc
      got.groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(_._4).map(_._3)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("SQ8 top-1 recalls the exact top-1 on this spread (8-bit fidelity)") {
    val path = Files.createTempDirectory("sqidx").toString
    try {
      SqIndexStore.write(vecs, path)
      val queries = vecs.where($"id" < 9)
      val sq = SqIndexStore.probe(spark, path, queries, k = 1)
        .select($"qid", $"nid").as[(Long, Long)].collect().toMap
      // exact top-1 by true dot over the quantized vectors
      val q = vecs.as[(Long, Seq[Float])].collect().map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000)).toArray
      }.toMap
      val hits = (1L to 8L).count { qid =>
        val best = q.collect { case (nid, v) if nid != qid =>
          nid -> q(qid).indices.map(d => q(qid)(d) * v(d)).sum
        }.toSeq.maxBy(t => (t._2, -t._1))._1
        sq(qid) == best
      }
      assert(hits >= 7, s"recall@1 $hits/8") // 8-bit codes: near-exact
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }
}
