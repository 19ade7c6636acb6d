package graft

import graft.operators.TrainingData

/** End-to-end curation pipeline: each stage drops exactly the doc
  * planted to trip it. */
class TrainingDataSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(i: Int, extra: String = ""): String = {
    val base = (1 to 45).map(j => s"w${i}_$j").mkString(" ")
    if (extra.isEmpty) base else base + " " + extra
  }

  test("curate drops one doc per planted defect, packs the rest") {
    val bench8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, mk(1), "src0"),                  // survives
      (2L, mk(1), "src0"),                  // exact dup of 1
      (3L, mk(1, "novel_tail_token"), "src1"), // near-dup of 1
      (4L, "tiny", "src1"),                 // fails the funnel
      (5L, mk(5, bench8), "src2"),          // contaminated
      (6L, mk(6), "src2"),                  // survives
      (7L, mk(7), "src3"))                  // survives
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text"))
    val bench = Seq(("q1", s"question about $bench8 end"))
      .toDF("qid", "qtext")

    val counts = TrainingData.curateCounts(docs, "doc_id", "text",
      "source", "n_chars", bench, "qtext",
      quota = Map.empty, defaultQuota = 100).toMap
    assert(counts("input") == 7)
    assert(counts("quality") == 6)        // -4 (short)
    assert(counts("exact_dedup") == 5)    // -2 (copy of 1)
    assert(counts("near_dedup") == 4)     // -3 (near-dup of 1)
    assert(counts("decontaminated") == 3) // -5 (benchmark 8-gram)
    assert(counts("mixed") == 3)          // quota doesn't bind

    val out = TrainingData.curate(docs, "doc_id", "text", "source",
      "n_chars", bench, "qtext", quota = Map.empty, defaultQuota = 100,
      windowTokens = 30)
    val rows = out.select($"doc_id", $"start_offset", $"first_window",
        $"last_window")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(1L, 6L, 7L))
    // each survivor is its shard's only doc: offset 0, 45 tokens
    // straddling the 30-token window boundary
    rows.values.foreach { case (_, off, fw, lw) =>
      assert(off == 0L && fw == 0L && lw == 1L)
    }
  }

  test("curate near-dup stage keeps exactly the lowest id of a cluster") {
    val docs = Seq(
      (10L, mk(9), "a"),
      (11L, mk(9, "tail_a"), "a"),
      (12L, mk(9, "tail_b"), "a"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text"))
    val bench = Seq(("q", "nothing shared here")).toDF("qid", "qtext")
    val out = TrainingData.curate(docs, "doc_id", "text", "source",
      "n_chars", bench, "qtext", Map.empty, 100, windowTokens = 1000)
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(10L))
  }

  private def curriculumFixture = {
    // 3 sources × 40 docs with varied unique-token share so every
    // quality bucket is populated
    val rows = for {
      s <- 0 to 2; i <- 1 to 40
      id = (s * 100 + i).toLong
      // repetition degree drives n_uniq/n_tok across buckets
      rep = 1 + (i % 4)
      toks = (1 to 12).flatMap(j => Seq.fill(rep)(s"w${id}_${j / rep}"))
    } yield (id, toks.mkString(" "), s"src$s")
    rows.toDF("doc_id", "text", "source")
  }

  test("curriculum order is a byte-identical pure function of content") {
    val docs = curriculumFixture
    val a = TrainingData.curriculumOrder(docs, "doc_id", "text",
      "source", nShards = 4).collect().toSet
    // re-run AND a different physical layout must reproduce it exactly
    val b = TrainingData.curriculumOrder(docs.repartition(13), "doc_id",
      "text", "source", nShards = 4).collect().toSet
    assert(a == b)
    // a different epoch keeps the curriculum shape but reshuffles
    val e1 = TrainingData.curriculumOrder(docs, "doc_id", "text",
      "source", nShards = 4, epoch = 1).collect().toSet
    assert(e1 != a)
    assert(e1.map(r => (r.getLong(0), r.getLong(3))) ==
      a.map(r => (r.getLong(0), r.getLong(3)))) // buckets unchanged
  }

  test("curriculum: quality-descending buckets, sources interleaved") {
    val docs = curriculumFixture
    val out = TrainingData.curriculumOrder(docs, "doc_id", "text",
      "source", nShards = 2)
      .select($"shard", $"pos", $"q_bucket", $"src_rank", $"source")
      .as[(Long, Long, Long, Long, String)].collect()
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val seq = rows.sortBy(_._2)
      // positions are exactly 1..n within the shard
      assert(seq.map(_._2).toSeq == (1L to seq.length).toSeq)
      // reading order: q_bucket never increases
      seq.sliding(2).foreach { case Array(p, n) =>
        assert(p._3 >= n._3, s"bucket rose at shard=$shard pos=${n._2}")
        // within a bucket, src_rank never decreases (cohort order)
        if (p._3 == n._3)
          assert(p._4 <= n._4, s"rank fell at shard=$shard pos=${n._2}")
      }
      // interleaving: within (bucket, rank) every source appears at
      // most once — a cohort cycles through the domains before any
      // domain repeats
      seq.groupBy(r => (r._3, r._4)).foreach { case (k, cohort) =>
        assert(cohort.map(_._5).distinct.length == cohort.length,
          s"source repeated inside cohort $k of shard $shard")
      }
    }
  }
}
