package graft

import org.apache.spark.sql.functions._

import graft.model.{OsmMember, OsmNode, OsmRelation, OsmWay}
import graft.operators.{Middle, MiddleStore}
import graft.sources.OsmXml.OsmDataFrames

/** Persisted bucketed middle — the flat-nodes analog (SURVEY §1.4):
  * save/load round trip, Exchange-free co-bucketed joins, and the
  * immutable-store change application (delete+reinsert semantics).
  */
class MiddleStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def frames: OsmDataFrames = OsmDataFrames(
    Seq(OsmNode(1, lon = 0, lat = 0), OsmNode(2, lon = 1, lat = 0),
      OsmNode(3, lon = 1, lat = 1), OsmNode(4, lon = 0, lat = 1)).toDF(),
    Seq(OsmWay(10, nodes = Seq(1, 2, 3)), OsmWay(11, nodes = Seq(3, 4))).toDF(),
    Seq(OsmRelation(20, members = Seq(OsmMember("w", 10, "outer")))).toDF())

  private def withStore[A](cfg: MiddleStore.Config)(f: => A): A =
    try f finally MiddleStore.drop(spark, cfg)

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("save/load round trip preserves streams and drops action") {
    val cfg = MiddleStore.Config(prefix = "t_ms_rt", buckets = 4)
    withStore(cfg) {
      MiddleStore.save(
        frames.copy(nodes = frames.nodes.withColumn("action", lit("create"))),
        cfg)
      assert(MiddleStore.exists(spark, cfg))
      val back = MiddleStore.load(spark, cfg)
      assert(!back.nodes.columns.contains("action"))
      assert(back.nodes.count() == 4 && back.ways.count() == 2 &&
        back.relations.count() == 1)
      val w = back.ways.where($"id" === 10)
        .select($"nodes").as[Seq[Long]].head()
      assert(w == Seq(1L, 2L, 3L))
    }
  }

  test("co-bucketed id join plans without a shuffle Exchange") {
    val cfg = MiddleStore.Config(prefix = "t_ms_bkt", buckets = 4)
    withStore(cfg) {
      MiddleStore.save(frames, cfg)
      val st = MiddleStore.load(spark, cfg)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // both sides bucketed by id with the same bucket count → the
        // equi-join on id needs no Exchange at all
        val joined = st.nodes.join(st.ways, "id")
        assert(exchanges(joined) == 0, joined.queryExecution.sparkPlan)

        // append fast path: only the changed-way side shuffles; the
        // node store is read in place. The unbucketed equivalent of
        // the same plan shuffles strictly more.
        val ids = Seq(10L).toDF("wid")
        val bucketed = MiddleStore.resolveWayCoordsFor(spark, cfg, ids, "wid")
        val fr = frames
        val plain = Middle.resolveAllWayCoords(fr.copy(
          ways = fr.ways.join(ids, fr.ways("id") === $"wid", "left_semi")))
        assert(exchanges(bucketed) < exchanges(plain),
          bucketed.queryExecution.sparkPlan)
        assert(bucketed.select($"wlons").as[Seq[Double]].head() ==
          Seq(0.0, 1.0, 1.0))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("applyChanges swaps to a new prefix with latest-version-wins") {
    val cur = MiddleStore.Config(prefix = "t_ms_v1", buckets = 2)
    val next = MiddleStore.Config(prefix = "t_ms_v2", buckets = 2)
    withStore(cur) {
      withStore(next) {
        MiddleStore.save(frames, cur)
        val changes = OsmDataFrames(
          // node 2 moves (v2); node 4 deleted
          Seq(OsmNode(2, version = 2, lon = 5, lat = 5),
            OsmNode(4, version = 2, visible = false)).toDF(),
          Seq.empty[OsmWay].toDF(),
          Seq.empty[OsmRelation].toDF())
        val updated = MiddleStore.applyChanges(spark, cur, next, changes)
        assert(updated.nodes.count() == 3)
        val moved = updated.nodes.where($"id" === 2)
          .select($"lon").as[Double].head()
        assert(moved == 5.0)
        // old store untouched until the caller drops it (rename-last)
        assert(MiddleStore.load(spark, cur).nodes.count() == 4)
        intercept[IllegalArgumentException] {
          MiddleStore.applyChanges(spark, cur, cur, changes)
        }
      }
    }
  }
}
