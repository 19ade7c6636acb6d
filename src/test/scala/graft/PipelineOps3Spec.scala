package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Skew, TextAnalysis}

/** Round-4 additions: semantic dedup, salted join/aggregate, per-group
  * top-n, source mixing, term relevance. */
class PipelineOps3Spec extends SparkSpecBase {
  import spark.implicits._

  test("semanticDedup keeps the lowest id of a near-dup pair per cell") {
    // ids 0 and 25 are centroids (id % 25 == 0); 0/1/2 identical
    // direction → same cell, near-dups; 25/30 orthogonal to them
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.999f, 0.01f)),
      (25L, Seq(0.0f, 1.0f)),
      (30L, Seq(0.01f, 0.999f))).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(e, "vec_id", "embedding", 0.95)
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(0L) == ((0L, true)))   // lowest id of its group survives
    assert(r(1L) == ((0L, false)))  // dup of 0
    assert(r(2L) == ((0L, false)))  // dup of 0 (and 1)
    assert(r(25L) == ((25L, true)))
    assert(r(30L)._1 == 25L)        // assigned to the other cell
    assert(!r(30L)._2)              // near-dup of 25 within that cell
  }

  test("semanticDedup near-dup check never crosses cells") {
    // 1 and 26 are 0.6° apart (cos ≈ 0.99995) but straddle the Voronoi
    // boundary between centroids 0 (at 0°) and 25 (at 45.6°), so they
    // land in different cells and neither is dropped: the trade-off
    // SemDeDup makes by design. Each is ~22.5° from its own centroid
    // (cos ≈ 0.924 < 0.99), so the centroids don't absorb them either.
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (25L, Seq(0.7f, 0.714f)),
      (1L, Seq(1.0f, 0.4142f)),   // 22.50° → cell 0
      (26L, Seq(1.0f, 0.4265f))). // 23.10° → cell 25
      toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(e, "vec_id", "embedding", 0.99)
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(r(1L) && r(26L))
  }

  test("saltedJoin equals the plain join") {
    val fact = (1 to 400).map(i => (i % 7L, i.toLong)).toDF("pk", "v")
    val dim = (0L to 6L).map(k => (k, s"brand$k")).toDF("pk", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("pk"), salts = 8)
      .groupBy($"name").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val plain = fact.join(dim, "pk")
      .groupBy($"name").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    assert(salted.orderBy($"name").collect().toSeq ==
      plain.orderBy($"name").collect().toSeq)
  }

  test("saltedAggregate equals the plain aggregate") {
    val df = (1 to 500).map(i => (i % 3L, i.toLong, i * 2L))
      .toDF("k", "a", "b")
    val salted = Skew.saltedAggregate(df, Seq("k"),
      Seq(col("a") -> "sa", col("b") -> "sb"), "n", salts = 4)
    val plain = df.groupBy($"k")
      .agg(sum($"a").as("sa"), sum($"b").as("sb"), count(lit(1)).as("n"))
    assert(salted.orderBy($"k").collect().toSeq ==
      plain.orderBy($"k").collect().toSeq)
  }

  test("topNPerGroup takes n by value desc with id tie-break") {
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 5L),
      (4L, "a", 20L), (5L, "b", 1L)).toDF("id", "g", "v")
    val r = Sampling.topNPerGroup(df, "g", "v", "id", 2)
      .select($"id", $"rk").as[(Long, Int)].collect().toMap
    assert(r == Map(4L -> 1, 1L -> 2, 5L -> 1)) // id 1 beats 2 on tie
  }

  test("sourceMix honors per-source quotas and the default") {
    val df = (1L to 100L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val r = Sampling.sourceMix(df, "src", "id",
      Map("src0" -> 7, "src1" -> 3), defaultQuota = 2)
    val bySrc = r.groupBy($"src").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc == Map("src0" -> 7L, "src1" -> 3L,
      "src2" -> 2L, "src3" -> 2L))
    // determinism: same input → same ids
    val again = Sampling.sourceMix(df, "src", "id",
      Map("src0" -> 7, "src1" -> 3), defaultQuota = 2)
    assert(r.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("incremental near-dup probes the corpus band index only") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (100L, shared),
      (101L, "utterly unrelated corpus document nothing shared at all ok"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, shared + " lambda"),          // near-dup of corpus 100
      (2L, "fresh novel words entirely absent from any other row yes"),
      (3L, shared + " mu"))              // also near-dup of 100
      .toDF("doc_id", "text")
    val idx = graft.operators.Dedup.bandIndex(corpus, "doc_id", "text")
    val cand = graft.operators.Dedup
      .incrementalNearDupCandidates(batch, "doc_id", "text", idx)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 100L)) && cand.contains((3L, 100L)))
    // batch↔batch pairs (1,3) must NOT appear — only corpus probes
    assert(cand.forall { case (_, c) => c >= 100L })
    assert(!cand.exists(_._1 == 2L))
  }

  test("pqReconstruction is zero for codebook donors, positive otherwise") {
    val dim = 8
    val rng = new scala.util.Random(5)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val err = graft.operators.Similarity
      .pqReconstruction(vecs, m = 2, centroidEvery = 10)
      .as[(Long, Long)].collect().toMap
    assert(err.size == 50)
    // donors (id % 10 == 0) encode to their own subvectors: err 0
    (0L until 50L by 10L).foreach(i => assert(err(i) == 0L, s"donor $i"))
    assert(err.values.exists(_ > 0L))
  }

  test("PQ store round-trip: persisted search equals in-memory search") {
    val dim = 16
    val rng = new scala.util.Random(21)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val queries = vecs.where($"id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("pqstore").toString
    try {
      graft.operators.Similarity.pqWriteStore(vecs, dir, m = 4,
        centroidEvery = 10)
      // the store's codes table is the compressed artifact: m longs/id
      val codes = spark.read.parquet(s"$dir/codes")
      assert(codes.count() == 120)
      assert(codes.select($"codes").as[Seq[Long]].head.length == 4)
      val fromStore = graft.operators.Similarity
        .pqSearchStore(spark, dir, queries, k = 5, m = 4)
        .select($"qid", $"nid", $"score", $"rank")
        .collect().map(_.toSeq).toSet
      val inMemory = graft.operators.Similarity
        .pqTopK(queries, vecs, k = 5, m = 4, centroidEvery = 10)
        .select($"qid", $"nid", $"score", $"rank")
        .collect().map(_.toSeq).toSet
      assert(fromStore == inMemory && fromStore.size == 20)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("SRP near-dup: identical vectors always surface; output is a " +
      "subset of the all-pairs result") {
    val rng = new scala.util.Random(11)
    val base = Array.fill(16)(rng.nextGaussian().toFloat)
    val vecs = ((0 until 30).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat).toSeq)
    } ++ Seq((100L, base.toSeq), (101L, base.toSeq))) // planted twins
      .toDF("vec_id", "embedding")
    val srp = Dedup.srpBlockedNearDup(vecs, "vec_id", "embedding", 0.25)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect().toSet
    // identical vectors share every key in every table — recall 1.0
    assert(srp.exists { case (a, b, c) => a == 100L && b == 101L && c > 0.999 })
    // bucketed candidates verified with the same cosine → subset of
    // the exhaustive operator's result at the same threshold
    val all = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", 0.25)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect().toSet
    assert(srp.subsetOf(all))
  }

  test("PQ with dim % m != 0 equals the run on kernel-truncated dims") {
    // dim=10, m=4 → subDim=2, dims 8..9 excluded by BOTH the encode
    // kernel (numElements/m) and the relational pqSubspaces slices; a
    // float subDim in the relational side would misalign subspace
    // starts (2.5·s) and silently corrupt ADC scores
    val dim = 10
    val rng = new scala.util.Random(33)
    val full = (0 until 80).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val trunc = full.select($"id", slice($"vec", 1, 8).as("vec"))
    val a = graft.operators.Similarity
      .pqTopK(full.where($"id" < 4), full, k = 5, m = 4, centroidEvery = 10)
      .select($"qid", $"nid", $"score", $"rank")
      .collect().map(_.toSeq).toSet
    val b = graft.operators.Similarity
      .pqTopK(trunc.where($"id" < 4), trunc, k = 5, m = 4, centroidEvery = 10)
      .select($"qid", $"nid", $"score", $"rank")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 20)
  }

  test("semanticDedup and ivfTopK fail loudly on an empty centroid sample") {
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(e, "vec_id", "embedding", 0.9,
        centroidEvery = 25)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfTopK(
        e.select($"vec_id".as("id"), $"embedding".as("vec")),
        e.select($"vec_id".as("id"), $"embedding".as("vec")),
        k = 1, centroidEvery = 25)
    }
  }

  test("temperatureMix flattens the source distribution, floors at one") {
    // sizes 100 / 25 / 1 → isqrt weights 10 / 5 / 1, Σ=16; budget 32
    // → targets 20 / 10 / 2 — the tail gets MORE than proportional
    // share (1/126 of docs → 1/16 of the mix), the T=2 flattening
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid")) ++
      Seq((126L, "tiny"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "source", "doc_id", 32)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out == Map("big" -> 20L, "mid" -> 10L, "tiny" -> 1L))
  }

  test("termRelevance scores tf times integer idf, rarest term worth most") {
    val df = Seq(
      (1L, "the the the cat"),   // tf(the)=3
      (2L, "data data pipeline"), // tf(data)=2
      (3L, "the data of all"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val r = TextAnalysis.termRelevance(df, "doc_id", "text",
      Seq("the", "data", "of"), topN = 4)
      .as[(Long, Long)].collect().toMap
    // N=4; df(the)=2, df(data)=2, df(of)=1
    val idfThe = 4L * 1000000L / 3L
    val idfData = 4L * 1000000L / 3L
    val idfOf = 4L * 1000000L / 2L
    assert(r(1L) == 3 * idfThe)
    assert(r(2L) == 2 * idfData)
    assert(r(3L) == idfThe + idfData + idfOf)
    assert(r(4L) == 0L)
  }

  test("bm25Retrieval: integer algebra matches hand-computed BM25, " +
      "length normalization penalizes the longer document") {
    val df = Seq(
      (1L, "cat cat"),                    // dl=2, tf=2
      (2L, "cat cat dog bird fish mouse"), // dl=6, tf=2
      (3L, "dog bird")).toDF("doc_id", "text") // dl=2, tf=0
    val r = TextAnalysis.bm25Retrieval(df, "doc_id", "text",
      Seq("cat"), topN = 3).as[(Long, Long)].collect()
    // N=3, T=10, df(cat)=2 → idf = 3e6 div 3 = 1e6
    // tfq = (tf·44·T·1000) div (20·tf·T + 6·T + 18·dl·N)
    def tfq(tf: Long, dl: Long): Long =
      (tf * 44 * 10 * 1000) / (20 * tf * 10 + 6 * 10 + 18 * dl * 3)
    assert(r.toSeq == Seq(
      (1L, 1000000L * tfq(2, 2)),  // short doc ranks first
      (2L, 1000000L * tfq(2, 6)),
      (3L, 0L)))
    // same tf, longer doc scores strictly lower (the b·dl/avgdl term)
    assert(tfq(2, 2) > tfq(2, 6))
  }
}
