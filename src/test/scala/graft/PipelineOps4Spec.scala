package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}

/** Round-8 additions: integer-exact k-means, leakage-safe splits,
  * rare-token scoring, token-budget selection, mutual k-NN graph. */
class PipelineOps4Spec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  test("kmeansAssignExact separates well-separated groups") {
    // ids 0 and 25 seed the two centroids (id % 25 == 0); everything
    // near +x joins 0's cluster, everything near +y joins 25's
    val e = vecs(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.9f, 0.1f),
      2L -> Seq(0.95f, 0.0f), 3L -> Seq(1.1f, -0.1f),
      25L -> Seq(0.0f, 1.0f), 26L -> Seq(0.1f, 0.9f),
      27L -> Seq(-0.1f, 1.05f))
    val r = Similarity.kmeansAssignExact(e)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(r.size == 7)
    assert(Seq(0L, 1L, 2L, 3L).map(r).distinct == Seq(0L))
    assert(Seq(25L, 26L, 27L).map(r).distinct == Seq(25L))
  }

  test("kmeansAssignExact n_members is consistent and total") {
    val e = vecs((0L to 60L).map(i =>
      i -> Seq((i % 3).toFloat, (i % 5).toFloat, 1.0f)): _*)
    val rows = Similarity.kmeansAssignExact(e, every = 10)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 61) // every vector assigned exactly once
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1)
      assert(members.head._3 == members.length.toLong)
    }
    assert(byCluster.values.map(_.length).sum == 61)
  }

  test("kmeansAssignExact iteration moves the boundary to the mean") {
    // seed centroids 0=(1,0) and 25=(0,1). Point 30=(0.4,0.45) starts
    // in 25's cell; after one recompute 25's mean drags toward the
    // heavy y-group and 0's toward x — assignment stays stable and
    // deterministic across runs (exact integers, no RNG anywhere)
    val e = vecs(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.8f, 0.0f),
      25L -> Seq(0.0f, 1.0f), 26L -> Seq(0.0f, 0.8f),
      30L -> Seq(0.4f, 0.45f))
    val a = Similarity.kmeansAssignExact(e)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Similarity.kmeansAssignExact(e)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.find(_._1 == 30L).get._2 == 25L)
  }

  test("kmeans argmin is unbiased by cluster size (exact rational compare)") {
    // state: cluster 0 holds 3 members summing to 0 (mean 0.0),
    // cluster 1 is a singleton at 10.0. A point at 4.0 is nearer
    // cluster 0's MEAN (d²=16e6 vs 36e6 in quantized units) — but its
    // raw n²-scaled costs are 144e6 vs 36e6, so comparing raw costs
    // would steal it for the small cluster. The kernel must compare
    // cost/n² exactly (cross-multiplied), assigning cluster 0.
    val dir = java.nio.file.Files.createTempDirectory("kmbias").toString
    try {
      Seq((0L, Seq(0L), 3L), (1L, Seq(10000L), 1L))
        .toDF("cid", "s", "n")
        .write.parquet(s"$dir/centroids")
      val r = Similarity.kmeansAssignStore(spark, dir,
          Seq((42L, Seq(4.0f))).toDF("id", "vec"))
        .as[(Long, Long)].collect()
      assert(r.toSeq == Seq((42L, 0L)))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("kmeans fails loudly when the seed predicate matches no id") {
    // ids 1..9 contain no multiple of 25 — the contract is a loud
    // error, never a silently empty assignment frame
    val e = vecs((1L to 9L).map(i => i -> Seq(i.toFloat)): _*)
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansAssignExact(e).collect()
    }
    assert(ex.getMessage.contains("centroid state is empty"))
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val split = Dedup.leakageSafeSplit(docs, "doc_id", "text")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(split.size == docs.count())
    val pairs = Dedup.jaccardOnPairs(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"),
      docs, "doc_id", "text")
      .where($"jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture should contain near-dups")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles splits")
    }
    // all three splits materialize at this corpus size
    assert(split.values.toSet == Set("train", "val", "test"))
  }

  test("rareTokenScore counts occurrences of low-df tokens") {
    val docs = Seq(
      (1L, "the cat sat"),        // 'the' df=3, 'cat' df=2, 'sat' df=1
      (2L, "the cat ran ran"),    // 'ran' df=1 (2 occurrences here)
      (3L, "the dog barks"))      // 'dog','barks' df=1
      .toDF("doc_id", "text")
    val r = TextAnalysis.rareTokenScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((3L, 2L, 666L)))  // cat+sat rare; 2000/3 = 666
    assert(r(2L) == ((4L, 3L, 750L)))  // cat + ran×2
    assert(r(3L) == ((3L, 2L, 666L)))  // dog+barks
  }

  test("tokenBudget keeps the md5-order prefix within budget") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, "g", Seq.fill(10)("w").mkString(" ")))
      .toDF("id", "grp", "text")
    val kept = Sampling.tokenBudget(docs, "grp", "id",
        size(graft.functions.TextFunctions.normToks($"text")), 55L)
      .as[(String, Long, Long, Long)].collect()
    // 10 tokens each, budget 55 → exactly 5 docs survive
    assert(kept.length == 5)
    assert(kept.map(_._4).max == 50L)
    // the kept set is the md5-order prefix: re-running with a larger
    // budget extends it, never swaps members (deterministic walk)
    val kept2 = Sampling.tokenBudget(docs, "grp", "id",
        size(graft.functions.TextFunctions.normToks($"text")), 105L)
      .as[(String, Long, Long, Long)].collect()
    assert(kept2.length == 10)
    assert(kept.map(_._2).toSet.subsetOf(kept2.map(_._2).toSet))
  }

  test("kmeans store assignment is bit-equal to the batch argmin") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val batch = Similarity.kmeansAssignExact(emb)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("kmstore").toString
    try {
      Similarity.kmeansWriteStore(emb, dir)
      val stored = Similarity.kmeansAssignStore(spark, dir, emb)
        .as[(Long, Long)].collect().toMap
      assert(stored == batch) // same model → identical assignments
      // an increment assigns under the frozen model, no retraining
      val inc = Similarity.kmeansAssignStore(spark, dir,
        emb.limit(5).withColumn("id", $"id" + 1000000L))
        .as[(Long, Long)].collect()
      assert(inc.length == 5)
      assert(inc.forall(r => batch.values.toSet.contains(r._2)))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("streaming kmeans assignment matches the batch store path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val rows = emb.as[(Long, Seq[Float])].collect().take(10)
    val dir = java.nio.file.Files.createTempDirectory("kmstream").toString
    try {
      Similarity.kmeansWriteStore(emb, dir)
      val input = MemoryStream[(Long, Seq[Float])]
      val assigned = graft.streaming.Streams.kmeansAssignStream(
        spark, input.toDS().toDF("id", "vec"), dir)
      val q = assigned.writeStream.outputMode("append")
        .format("memory").queryName("km_out").start()
      input.addData(rows.toSeq)
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("km_out")
        .as[(Long, Long)].collect().toMap
      val batch = Similarity.kmeansAssignStore(spark, dir, emb)
        .as[(Long, Long)].collect().toMap
      assert(streamed == rows.map(r => r._1 -> batch(r._1)).toMap)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("dedupEffectiveness books each cluster's survivor once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rep = graft.operators.CorpusOps
      .dedupEffectiveness(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect()
    // per source: survivors ≤ docs, kept tokens ≤ tokens
    rep.foreach { case (_, nd, nk, nt, kt) =>
      assert(nk <= nd); assert(kt <= nt); assert(nk > 0)
    }
    // totals: every doc counted once; dropped docs = clustered minus
    // cluster count (each cluster keeps exactly one)
    assert(rep.map(_._2).sum == docs.count())
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    val expectedDropped = clusters.length -
      clusters.map(_._2).distinct.length
    assert(rep.map(r => r._2 - r._3).sum == expectedDropped)
  }

  test("cluster-balanced sample caps every cell") {
    val sampled = graft.queries.Pipeline7
      .clusterSample(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Int)].collect()
    assert(sampled.nonEmpty)
    sampled.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("overlappingChunks tiles every token with the right overlap") {
    val docs = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val rows = graft.operators.CorpusOps
      .overlappingChunks(docs, "doc_id", "text", k = 32, stride = 16)
      .as[(Long, Int, Long, Long, String)].collect()
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // 40 tokens, stride 16 → starts 1, 17, 33; window lens 32, 24, 8
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((1, 1L, 32L), (2, 17L, 24L), (3, 33L, 8L)))
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.map(r => (r._2, r._3, r._4)).toSeq == Seq((1, 1L, 3L)))
    assert(!rows.exists(_._1 == 3L)) // empty doc → no chunks
  }

  test("importanceResample thins over-represented sources only") {
    val docs = (1 to 300).map(i =>
      (i.toLong, if (i <= 200) "big" else "small", "t"))
      .toDF("doc_id", "source", "text")
    // targets: big 250‰ (under-weighted → thins to ~250/1000·300/200
    //   = 37.5% acceptance), small at 800‰ (≥ its 33% share → keeps all)
    val kept = graft.operators.CorpusOps.importanceResample(
      docs, "source", "doc_id",
      Map("big" -> 250L, "small" -> 800L), 50L)
      .as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).map { case (s, r) => s -> r.length }
    assert(bySrc("small") == 100) // threshold caps at ffff → all kept
    assert(bySrc("big") < 200 && bySrc("big") > 40) // thinned ~37.5%
    // deterministic: same call, same rows
    val again = graft.operators.CorpusOps.importanceResample(
      docs, "source", "doc_id",
      Map("big" -> 250L, "small" -> 800L), 50L)
      .as[(Long, String)].collect()
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("streaming token budget matches batch in one batch, persists across") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq.tabulate(20)(i => (i.toLong, "g", 10L))
    val batchDf = docs.toDF("id", "grp", "n")
    val batch = Sampling.tokenBudget(batchDf, "grp", "id", $"n", 55L)
      .select($"id", $"cum_toks").as[(Long, Long)].collect().toMap

    val input = MemoryStream[(Long, String, Long)]
    val sel = graft.streaming.Streams.streamingTokenBudget(
      input.toDS().toDF("id", "grp", "n"), "grp", "id", "n", 55L)
    val q = sel.writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    input.addData(docs) // batch 1: everything at once
    q.processAllAvailable()
    val streamed = spark.table("budget_out")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(streamed == batch) // identical md5-walk selection
    // batch 2: the group is saturated — nothing more is emitted, the
    // running state survived the micro-batch boundary
    input.addData((100L, "g", 1L))
    q.processAllAvailable(); q.stop()
    assert(spark.table("budget_out").count() == batch.size)
  }

  test("sharded token budget equals the sequential walk exactly") {
    // one giant group (the case that serializes the global-walk form)
    // plus a small one; ids chosen so shards are non-trivially filled
    val docs = (1L to 500L).map(i => (i, "g", 3L + i % 7)) ++
      (1000L to 1010L).map(i => (i, "h", 5L))
    val df = docs.toDF("id", "grp", "n")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"grp", $"id", $"n_toks", $"cum_toks")
        .as[(String, Long, Long, Long)].collect().toSet
    val seqF = Sampling.tokenBudget(df, "grp", "id", $"n", 600L)
    val shrd = Sampling.tokenBudgetSharded(df, "grp", "id", $"n", 600L)
    assert(rows(shrd) == rows(seqF))
    assert(rows(shrd).nonEmpty)
    // and both bind strictly: nothing over budget, per group
    rows(shrd).groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).max <= 600L)
    }
  }

  test("corpus diff classifies every id across two snapshots") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val r = graft.operators.CorpusOps
      .corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("vocab coverage: OOV occurrences counted against the top-V cut") {
    // "common" appears 6x (in vocab at V=2), "shared" 4x, the typo
    // tokens once each — with V=2 the vocab is {common, shared}
    val docs = Seq(
      (1L, "common common common shared shared typoa"),
      (2L, "common common common shared shared typob typob"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .vocabCoverage(docs, "doc_id", "text", topV = 2)
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_permille")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 6L, 1L, 166L)))
    assert(r(2L) == ((2L, 7L, 2L, 285L)))
  }

  test("containment catches the quote case Jaccard misses") {
    val docs = Seq(
      (1L, "alpha beta gamma"),                               // short
      (2L, "alpha beta gamma " + (1 to 20).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentOnPairs(pairs, docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._3 == 1.0)            // all of doc 1 inside doc 2
    assert(r._4 < 0.2)             // doc 2 barely overlaps doc 1
  }

  test("dropRepeatedSegments keeps first occurrences only") {
    val seg1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val seg2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$seg1 $seg2 $seg1"),   // 3 segments, third repeats first
      (2L, "x y z"))                // one short segment, nothing to drop
      .toDF("doc_id", "text")
    val r = graft.operators.CorpusOps
      .dropRepeatedSegments(docs, "doc_id", "text", k = 8)
      .select($"doc_id", $"n_segments", $"n_removed", $"cleaned")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 3 && r(1L)._3 == 1)
    assert(r(1L)._4 == s"$seg1 $seg2")
    assert(r(2L)._2 == 1 && r(2L)._3 == 0 && r(2L)._4 == "x y z")
  }

  test("lcsOnPairs finds the verbatim run Jaccard dilutes") {
    val run = (1 to 30).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run unique tail one"),
      (2L, (1 to 40).map(i => s"z$i").mkString(" ") + " " + run),
      (3L, "totally different words"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val r = Dedup.lcsOnPairs(pairs, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(r((1L, 2L)) == (30L, 33L)) // the shared 30-token run
    assert(r((1L, 3L))._1 == 0L)
    // empty-side guard
    val e = Dedup.lcsOnPairs(Seq((3L, 4L)).toDF("id_a", "id_b"),
      docs.union(Seq((4L, "")).toDF("doc_id", "text")),
      "doc_id", "text").as[(Long, Long, Long, Long)].collect().head
    assert(e._3 == 0L)
  }

  test("shardAssign is a deterministic partition of the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = Sampling.shardAssign(docs.select($"doc_id", $"source"),
      "doc_id", nShards = 16)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Long)].collect()
    assert(r.length == docs.count()) // partition: every doc exactly once
    assert(r.map(_._2).distinct.forall(s => s >= 0 && s < 16))
    // positions are 1..n_shard_docs within each shard (dense ranks)
    r.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // re-run identical
    val again = Sampling.shardAssign(docs.select($"doc_id", $"source"),
      "doc_id", nShards = 16)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Long)].collect()
    assert(r.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("bpeMerges learns greedy merges round by round") {
    import graft.operators.TextAnalysis
    // "a a a" exercises greedy left-to-right: one (a,a) fuse per doc,
    // not two overlapping ones; round 2 must see the FUSED corpus
    val docs = Seq(
      (1L, "a a a b c"),
      (2L, "a a b c"),
      (3L, "a a b"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, "text", rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, String, Long)].collect()
    // round 1: (a,a) x3 wins (doc1 counts it twice? no — pairs are
    // positional: doc1 has (a,a),(a,a),(a,b),(b,c) → (a,a) count 2+1+1=4)
    assert(m(0) == ((1, "a", "a", "a+a", 4L)))
    // fused corpus: [a+a a b c], [a+a b c], [a+a b] →
    // round 2 pairs: (a+a,a),(a,b),(b,c) / (a+a,b),(b,c) / (a+a,b)
    // → (a+a,b) ties (b,c) at 2; '+' < 'b' so "a+a b" wins the tie
    assert(m(1) == ((2, "a+a", "b", "a+a+b", 2L)))
    // round 3: corpus [a+a a b c]→ wait, doc1 round-2 fuse applies to
    // (a+a, b)? doc1 is [a+a, a, b, c] — no adjacent (a+a, b); so
    // round-3 pairs: doc1 (a+a,a),(a,b),(b,c); doc2 [a+a+b, c] →
    // (a+a+b,c); doc3 [a+a+b] → none. (b,c) has 1, (a+a+b,c) 1,
    // (a+a,a) 1, (a,b) 1 → lexicographic min "a b" wins
    assert(m(2) == ((3, "a", "b", "a+b", 1L)))
  }

  test("bpeApply reports the compression the merges buy") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a a a b c"),   // round1 fuses (a,a) once → 4 tokens, then
                           // round2 (a+a,b)? traced in the merges spec
      (2L, "a a b c"),
      (3L, "a a b"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeApply(docs, "doc_id", "text", rounds = 3)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // from the bpeMerges trace: doc1 [a+a,a,b,c]→round3 (a,b) fuse →
    // [a+a,a+b,c] = 3; doc2 [a+a+b,c] = 2; doc3 [a+a+b] = 1
    assert(r(1L) == ((1L, 5L, 3L)))
    assert(r(2L) == ((2L, 4L, 2L)))
    assert(r(3L) == ((3L, 3L, 1L)))
  }

  test("exactQuantiles uses nearest-rank on actual values") {
    import graft.operators.TextAnalysis
    // group g: measures 1..10 → p50 = rank ceil(5.0)=5 → value 5,
    // p90 = rank 9 → 9, p99 = rank ceil(9.9)=10 → 10
    val docs = (1 to 10).map(i => ("g", i.toLong, ("x " * i).trim))
      .toDF("source", "doc_id", "text")
    val r = TextAnalysis.exactQuantiles(docs, "source", "doc_id",
      size(graft.functions.TextFunctions.normToks($"text")))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(r == (("g", 10L, 5L, 9L, 10L)))
  }

  test("exportShards round-trips and verifies against its manifest") {
    import graft.operators.TrainingData
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source", $"text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val manifest = TrainingData
      .exportShards(docs, "doc_id", "text", nShards = 8, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(manifest.values.map(_._1).sum == docs.count())
    // the exported data verifies against the manifest
    val ok = TrainingData.verifyShards(spark, "text", dir)
      .as[(Long, Boolean)].collect()
    assert(ok.length == manifest.size && ok.forall(_._2))
    // re-export is byte-identical: same manifest digests
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-shards2").toString
    val again = TrainingData
      .exportShards(docs, "doc_id", "text", nShards = 8, dir2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(again == manifest)
    // a corrupted shard fails verification
    val data = spark.read.parquet(s"$dir/data")
    data.where($"shard" =!= 3).write.mode("overwrite")
      .partitionBy("shard").parquet(s"$dir2/data")
    // splice dir2's manifest from dir (counts for shard 3 now wrong)
    val fs = java.nio.file.Paths.get(s"$dir2/manifest")
    org.apache.commons.io.FileUtils.deleteDirectory(fs.toFile)
    org.apache.commons.io.FileUtils.copyDirectory(
      java.nio.file.Paths.get(s"$dir/manifest").toFile, fs.toFile)
    val bad = TrainingData.verifyShards(spark, "text", dir2)
      .as[(Long, Boolean)].collect().toMap
    assert(bad(3L) == false)
    assert(bad.count(!_._2) == 1)
  }

  test("contaminationReport counts sharing docs per benchmark doc") {
    import graft.operators.TextAnalysis
    val run = (1 to 8).map(i => s"t$i").mkString(" ")
    val bench = Seq((100L, run), (101L, "nothing shared here at all"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, s"$run extra words"),      // shares the 8-gram with bench 100
      (2L, s"prefix $run"),           // also shares it
      (3L, "completely different content"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.contaminationReport(
      docs, "doc_id", "text", bench, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(100L) == ((100L, 2L, 2L))) // docs 1 and 2, one gram each
    assert(r(101L) == ((101L, 0L, 0L))) // zero-hit rows still reported
  }

  test("mutualKnnGraph edges are mutual and within candidates") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val edges = Similarity.mutualKnnGraph(emb, "vec_id", "embedding", 3)
      .as[(Long, Long, Double)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (a, b, cos) =>
      assert(a < b); assert(cos <= 1.0001 && cos >= -1.0001)
    }
    assert(edges.map(e => (e._1, e._2)).distinct.length == edges.length)
    // mutuality: every edge endpoint ranks the other ≤ k among ITS
    // candidates — check via an independent per-node degree bound
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.length)
    assert(deg.max <= 3, "a node with > k mutual edges is impossible")
  }
}
