package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Dedup, Sessions, TextAnalysis}

/** Round-4 pipeline operators: int8 quantization, chunk dedup,
  * sessionization, filter funnel, unigram mass. */
class PipelineOps2Spec extends SparkSpecBase {
  import spark.implicits._

  test("redactPii counts and redacts each class; order email→ip→phone") {
    val df = Seq(
      (1L, "write a@b.org or c.d+x@e-f.co.uk please"),
      (2L, "server 192.168.0.1 and 10.0.0.7 up"),
      (3L, "call +1 (555) 010-1234 or 555 010 9999 now"),
      (4L, "mixed a@b.org at 10.0.0.7 call 555 010 9999"),
      (5L, "nothing here"),
      (6L, "not an ip 1.2.3 and short 12 34")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = (r(i).getInt(1), r(i).getInt(2), r(i).getInt(3),
      r(i).getString(4))
    assert(row(0) == (2, 0, 0, "write <EMAIL> or <EMAIL> please"))
    assert(row(1) == (0, 2, 0, "server <IP> and <IP> up"))
    assert(row(2) == (0, 0, 2, "call <PHONE> or <PHONE> now"))
    // mixed: the ip is consumed by the ip pass BEFORE the phone scan
    assert(row(3) == (1, 1, 1, "mixed <EMAIL> at <IP> call <PHONE>"))
    assert(row(4) == (0, 0, 0, "nothing here"))
    assert(row(5) == (0, 0, 0, "not an ip 1.2.3 and short 12 34"))
    // map-only projection: no exchange in the plan
    val plan = TextAnalysis.redactPii(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("int8Quantize saturates at ±127 and zeroes all-zero vectors") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("id", "embedding")
    val q = df.select($"id",
      VectorFunctions.int8Quantize($"embedding").as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    // scale = 2.0/127: 1.0 → 64 (63.5 rounds half-up), -2 → -127, 0.5 → 32
    assert(q(1L) == Seq(64L, -127L, 32L))
    assert(q(2L) == Seq(0L, 0L, 0L))
  }

  test("chunkDedup counts duplicated chunks corpus-wide") {
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + "tail one"),
      (2L, shared + " " + "different ending here"),
      (3L, "entirely novel words only")).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 16)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // docs 1+2 share their first 16-token chunk; the stragglers differ
    assert(r(1L) == ((2L, 1L)))
    assert(r(2L) == ((2L, 1L)))
    assert(r(3L) == ((1L, 0L)))
  }

  test("sessionStats splits on gap, breaks ts ties deterministically") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val events = Seq(
      // user 1: 3 events in one session, then a 31-min gap, then 1
      (1L, ts(0), 100L), (1L, ts(10), 101L), (1L, ts(20), 102L),
      (1L, ts(51), 103L),
      // user 2: two events at the SAME timestamp + one later
      (2L, ts(0), 200L), (2L, ts(0), 201L), (2L, ts(90), 202L))
      .toDF("user_id", "ts", "event_id")
    val r = Sessions.sessionStats(events, "user_id", "ts", "event_id", 1800)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 2L, 4L, 3L, 20L * 60000000L)))
    assert(r(2L) == ((2L, 2L, 3L, 2L, 0L)))
  }

  test("filterFunnel stages are nested") {
    val long = (1 to 50).map(i => s"tok$i").mkString(" ")  // 50 uniq tokens
    val repeats = Seq.fill(50)("same").mkString(" ")
    val df = Seq(
      ("a", long, 300L),        // passes all 4
      ("a", repeats, 300L),     // fails TTR (1 distinct / 50)
      ("a", "short text", 10L), // fails length
      ("b", long, 100L))        // fails length (chars < 200)
      .toDF("source", "text", "n_chars")
    val r = TextAnalysis.filterFunnel(df, "source", "text", "n_chars")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("a") == (("a", 3L, 2L, 2L, 1L, 1L)))
    assert(r("b") == (("b", 1L, 0L, 0L, 0L, 0L)))
  }

  test("incrementalDedup drops corpus hits and in-batch duplicates") {
    val corpus = Seq((100L, "seen before")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "seen before"),     // in corpus → dropped
      (2L, "fresh content"),   // survives
      (3L, "fresh content"),   // in-batch dup of 2 → dropped
      (4L, "also new")).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted
    assert(r.toSeq == Seq(2L, 4L))
  }

  test("dupSpanCoverage covers the union of duplicated k-gram spans") {
    // docs 1 and 2 share tokens 1..6 ("a b c d e f"): the two 5-grams
    // starting there are duplicated, covering 6 positions in each
    val df = Seq(
      (1L, "a b c d e f x1 y1 z1"),
      (2L, "a b c d e f x2 y2 z2"),
      (3L, "totally unrelated short")).toDF("doc_id", "text")
    val r = Dedup.dupSpanCoverage(df, "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 9L, 6L)))
    assert(r(2L) == ((2L, 9L, 6L)))
    assert(r(3L) == ((3L, 3L, 0L)))  // < k tokens → no grams, 0 covered
  }

  test("unigramMass sums corpus counts per token occurrence") {
    val df = Seq(
      (1L, "a a b"),
      (2L, "b c")).toDF("doc_id", "text")
    // corpus counts: a=2, b=2, c=1
    val r = TextAnalysis.unigramMass(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 3L, 6L, 2L)))  // 2+2+2, rarest 2
    assert(r(2L) == ((2L, 2L, 3L, 1L)))  // 2+1, rarest 1
  }
}
