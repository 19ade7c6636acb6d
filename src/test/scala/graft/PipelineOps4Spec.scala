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
