package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Corpus-level curation operators (CorpusOps): segment dedup,
  * Gopher rules, length buckets, weighted sampling — semantics on
  * hand-built fixtures plus plan-shape checks (the oracle queries
  * q83-q86 pin the cross-engine arithmetic). */
class CorpusOpsSpec extends SparkSpecBase {

  import spark.implicits._

  test("segmentDedup counts cross-document duplicated segments only") {
    // ten-word segments; doc 1 and 2 share their first segment, doc 3
    // is disjoint; a segment duplicated WITHIN one doc only does not
    // count as cross-document
    val seg = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, s"$seg a b c"),
      (2L, s"$seg x y z"),
      (3L, "q r s t u v w x y z extra"),
      (4L, s"self self2 self3 self4 self5 s6 s7 s8 s9 s10 " +
        "self self2 self3 self4 self5 s6 s7 s8 s9 s10")
    ).toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == ((2L, 1L))) // seg + remainder; seg is shared
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((2L, 0L)))
    // doc 4 repeats its own segment twice: countDistinct(doc)=1 → not
    // a cross-document duplicate
    assert(out(4L) == ((2L, 0L)))
  }

  test("gopherRules flags thresholds exactly") {
    val good = ("the a " + Seq.fill(30)("word").mkString(" "))
    val shortDoc = "the a tiny"
    val noStops = Seq.fill(40)("word").mkString(" ")
    val docs = Seq((1L, good), (2L, shortDoc), (3L, noStops))
      .toDF("doc_id", "text")
    val out = CorpusOps.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok_word_count"),
          r.getAs[Boolean]("ok_stop_words"),
          r.getAs[Boolean]("pass"))).toMap
    assert(out(1L) == ((true, true, true)))
    assert(out(2L) == ((false, true, false)))  // 3 words, has the+a
    assert(out(3L) == ((true, false, false)))  // no stop words
  }

  test("lengthBuckets: power-of-two ceiling with padding waste") {
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),   // 3 → bucket 4
      (2L, Seq.fill(4)("w").mkString(" ")),   // 4 → bucket 4 (exact)
      (3L, Seq.fill(5)("w").mkString(" ")),   // 5 → bucket 8
      (4L, "w")                               // 1 → bucket 1
    ).toDF("doc_id", "text")
    val out = CorpusOps.lengthBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(4L) == ((2L, 7L, 8L)))  // docs 1+2, 3+4 tokens, pad 8
    assert(out(8L) == ((1L, 5L, 8L)))
    assert(out(1L) == ((1L, 1L, 1L)))
  }

  test("weightedSample keeps ~weight-proportional deterministic set") {
    val docs = (0L until 1000L).map(i => (i, (i % 3000).toInt))
      .toDF("doc_id", "n_chars")
    val kept = CorpusOps.weightedSample(docs, "doc_id", "n_chars", 3000L)
    val n = kept.count()
    // E[kept] = mean(weight)/3000 * 1000 ≈ 166; md5 is uniform enough
    // for a wide deterministic band
    assert(n > 80 && n < 280, s"kept $n")
    // deterministic: same input → identical set
    assert(kept.agg(sum("doc_id")).head.getLong(0) ==
      CorpusOps.weightedSample(docs, "doc_id", "n_chars", 3000L)
        .agg(sum("doc_id")).head.getLong(0))
    // zero weight never survives, full weight nearly always does
    assert(kept.where(col("n_chars") === 0).count() == 0L)
  }

  test("segmentDedup plan: one shuffle on the segment key, one on doc") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = CorpusOps.segmentDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // partial aggregation before each exchange (map-side combine)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 3, s"too many shuffles:\n$plan")
    assert(plan.contains("partial_count") ||
      plan.contains("HashAggregate"), plan)
  }
}
