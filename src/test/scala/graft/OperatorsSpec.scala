package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.model.{OsmMember, OsmNode, OsmRelation, OsmWay}
import graft.operators.{Dedup, Expire, Middle, Similarity, Update}
import graft.sources.Validate

/** Operator semantics on tiny OSM-shaped fixtures (the Spark analog of
  * the reference's test-middle / test-expire / forward-dependency
  * coverage). */
class OperatorsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val nodes = Seq(
    OsmNode(1, lon = 0, lat = 0), OsmNode(2, lon = 1, lat = 0),
    OsmNode(3, lon = 1, lat = 1), OsmNode(4, lon = 0, lat = 1),
    OsmNode(5, lon = 5, lat = 5)).toDF()

  private lazy val ways = Seq(
    OsmWay(10, nodes = Seq(1, 2, 3)),
    OsmWay(11, nodes = Seq(3, 4)),
    OsmWay(12, nodes = Seq(5, 5))).toDF()

  private lazy val rels = Seq(
    OsmRelation(20, members = Seq(OsmMember("w", 10, "outer"),
      OsmMember("w", 11, "inner"), OsmMember("n", 5, ""))),
    OsmRelation(21, members = Seq(OsmMember("w", 12, ""),
      OsmMember("w", 99, "")))).toDF()

  test("resolveWayNodes keeps node order, drops missing refs") {
    val r = Middle.resolveWayNodes(ways, "id", "nodes",
      nodes.select($"id".as("nid"), $"lon", $"lat"), "nid", Seq("lon", "lat"))
    val m = r.select($"id", transform($"resolved",
        x => x.getField("lon")).as("lons"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(m(10L) == Seq(0.0, 1.0, 1.0))
    assert(m(11L) == Seq(1.0, 0.0))
    assert(m(12L) == Seq(5.0, 5.0)) // duplicate refs resolve twice
  }

  test("parentsOfNodes finds containing ways (semi-join)") {
    val changed = Seq(3L).toDF("cid")
    val p = Middle.parentsOfNodes(ways, "id", "nodes", changed, "cid")
      .as[Long].collect().toSet
    assert(p == Set(10L, 11L))
  }

  test("parentsOfMembers filters by member type") {
    val p = Middle.parentsOfMembers(rels, "id", "members", "w",
      Seq(11L).toDF("cid"), "cid", typeField = "mtype")
      .as[Long].collect().toSet
    assert(p == Set(20L))
    val pn = Middle.parentsOfMembers(rels, "id", "members", "n",
      Seq(5L).toDF("cid"), "cid", typeField = "mtype")
      .as[Long].collect().toSet
    assert(pn == Set(20L))
  }

  test("resolveRelationMembers counts found vs referenced") {
    val r = Middle.resolveRelationMembers(rels, "id", "members", "w",
      ways.select($"id".as("wid")), "wid", Nil, typeField = "mtype")
    val m = r.select($"id", $"n_referenced", $"n_found")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(20L) == ((2L, 2L)))
    assert(m(21L) == ((2L, 1L))) // way 99 missing — still OK
  }

  test("dependency closure: changed node -> pending ways -> pending rels") {
    val (pendingWays, pendingRels) = Update.dependencyClosure(
      Seq(4L).toDF("id"), ways, "id", "nodes", rels, "id", "members",
      typeField = "mtype")
    assert(pendingWays.as[Long].collect().toSet == Set(11L))
    assert(pendingRels.select("id").as[Long].collect().toSet == Set(20L))
  }

  test("latest-version-wins + op classification") {
    val changes = Seq(
      (100L, 1, true), (100L, 2, true), (100L, 3, false),
      (200L, 1, true)).toDF("oid", "version", "visible")
    val latest = Update.withOp(
      Update.latestVersion(changes, "oid", "version"), "visible", "version")
    val m = latest.select($"oid", $"version", $"op")
      .as[(Long, Int, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(100L) == ((3, "delete")))
    assert(m(200L) == ((1, "create")))
  }

  test("k-way merge keeps highest (version, priority) per id") {
    val f1 = Seq((1L, 1, "a"), (2L, 1, "b")).toDF("id", "version", "v")
      .withColumn("prio", lit(1))
    val f2 = Seq((1L, 2, "a2"), (2L, 1, "b2")).toDF("id", "version", "v")
      .withColumn("prio", lit(2))
    val merged = Validate.mergeFiles(Seq(f1, f2), "id", "version", "prio")
    val m = merged.select($"id", $"v").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "a2", 2L -> "b2"))
  }

  test("oversized relations dropped at the reference's 32767 cap") {
    val big = OsmRelation(30,
      members = (1 to 32768).map(i => OsmMember("n", i.toLong, "")))
    val ok = OsmRelation(31, members = Seq(OsmMember("n", 1, "")))
    val out = Validate.dropOversizedRelations(Seq(big, ok).toDF())
      .select("id").as[Long].collect().toSet
    assert(out == Set(31L))
  }

  test("expire: point cover + rollup dedups parents") {
    val pts = Seq((0.05, 0.05), (0.06, 0.06), (90.0, 45.0))
      .toDF("lon", "lat")
    val cover = Expire.pointCover(pts, $"lon", $"lat", 14)
    val tiles = cover.select($"x", $"y")
    val rolled = Expire.rollup(tiles, "x", "y", 14, 12)
    val byZoom = rolled.groupBy($"zoom").count()
      .as[(Int, Long)].collect().toMap
    assert(byZoom(14) == cover.count())
    assert(byZoom(12) <= byZoom(14))
    val formatted = Expire.formatTiles(rolled).as[String].collect()
    assert(formatted.forall(_.matches("\\d+/\\d+/\\d+")))
  }

  test("LSH top-k recovers most brute-force neighbors (recall)") {
    val dim = 16
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val queries = vecs.where($"id" < 5)
    val brute = Similarity.bruteForceTopK(queries, vecs, 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, vecs, 5, planes = 12, bands = 6,
      dim = dim).select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("exact + minhash dedup find planted duplicates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark query engines ok"),
      (4L, "the quick brown fox jumps over the lazy dog again and again maybe"))
      .toDF("doc_id", "text")
    val exact = Dedup.exact(docs, "doc_id", "text")
    assert(exact.where($"n_docs" === 2).count() == 1)
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide
    val jac = Dedup.jaccardOnPairs(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"), docs,
      "doc_id", "text")
    val j12 = jac.where($"id_a" === 1 && $"id_b" === 2)
      .select($"jaccard").as[Double].head()
    assert(j12 == 1.0)
  }
}
