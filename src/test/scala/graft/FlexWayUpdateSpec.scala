package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.classic.ClassicUpdate
import graft.flex.TwoStage
import graft.sources.{OsmText, OsmXml}

/** Port of the two-stage flex update features
  * (tests/bdd/flex/way-add.feature, way-change.feature, way-del.feature,
  * way-relation-add.feature, way-relation-del.feature — all driven by
  * tests/data/test_output_flex_way.lua — plus node-add.feature /
  * test_output_flex_node.lua):
  *
  *  - t1     rows = entities tagged t1 (any stage);
  *  - t2     rows = entities tagged t2 AND marked by some relation via
  *           select_relation_members (role 'mark'), rel_ids = sorted
  *           '{r1,r2}' of the marking relations (stage 2 only);
  *  - tboth  rows = entities tagged tboth, rel_ids filled when marked,
  *           NULL otherwise;
  *  - geom is not_null: a way whose resolved line degenerates (missing
  *    refs, <2 distinct points) is dropped from every table.
  *
  * Each scenario asserts the exact final table contents after the
  * initial import and again after applying the change file, like the
  * features do. The declarative model recomputes from the updated
  * entity set — add/change/delete and relation-membership churn all
  * collapse onto the same dataflow, which is the point of the
  * Spark-first design (no pending-id queues, no delete/reinsert).
  */
class FlexWayUpdateSpec extends SparkSpecBase {

  import spark.implicits._

  // the features' 0.1 grid: n10..n19, column pairs left to right
  //   | 11 | 13 | 15 | 17 | 19 |   (y = 10.1)
  //   | 10 | 12 | 14 | 16 | 18 |   (y = 10.0)
  private val grid = (10 to 19).map { i =>
    val x = 10.0 + ((i - 10) / 2) * 0.1
    val y = 10.0 + ((i - 10) % 2) * 0.1
    s"n$i v1 dV x$x y$y"
  }.mkString("\n")

  /** expected contents: t1 ids; t2/tboth id → rel_ids (None = NULL) */
  private case class Exp(t1: Set[Long], t2: Map[Long, Option[String]],
      tboth: Map[Long, Option[String]])

  private case class Scn(name: String, base: String, diff: String,
      before: Exp, after: Exp)

  /** '{r1,r2}' per marked member id — the w2r/n2r map built by
    * process_relation over role='mark' members of `mtype`. */
  private def marks(rels: DataFrame, mtype: String): DataFrame =
    rels.select($"id".as("rel_id"), explode($"members").as("m"))
      .where($"m.mtype" === mtype && $"m.role" === "mark")
      .groupBy($"m.ref".as("mid"))
      .agg(concat(lit("{"),
        array_join(transform(array_sort(collect_set($"rel_id")),
          x => x.cast("string")), ","),
        lit("}")).as("rel_ids"))

  /** Run the test_output_flex_way/node.lua model; returns the exact
    * contents of (t1, t2, tboth). */
  private def flexTables(osm: OsmXml.OsmDataFrames, mtype: String)
      : (Set[Long], Map[Long, Option[String]], Map[Long, Option[String]]) = {
    val m2r = marks(osm.relations, mtype)

    // geom not_null: ways must form a real linestring after resolve +
    // consecutive-duplicate dedup (geom-from-osm semantics); node
    // points are always valid here
    val entities =
      if (mtype == "n") osm.nodes
      else {
        val lineOk = udf((lons: Seq[Double], lats: Seq[Double]) =>
          graft.geom.FromOsm.createLineString(
            lons.zip(lats).map { case (x, y) => graft.geom.Pt(x, y) }) match {
            case _: graft.geom.NullGeom => false
            case _                      => true
          })
        val ok = graft.operators.Middle.resolveAllWayCoords(osm)
          .where(lineOk($"wlons", $"wlats"))
          .select($"rwid".as("id"))
        osm.ways.join(ok, "id")
      }

    def stageRows(df: DataFrame, stage2: Boolean): DataFrame = {
      val withIds =
        if (stage2) df.join(m2r, df("id") === m2r("mid"), "left")
        else df.withColumn("rel_ids", lit(null).cast("string"))
      val t1 = withIds.where($"tags".getItem("t1").isNotNull)
        .select($"id", lit("t1").as("tbl"),
          lit(null).cast("string").as("rel_ids"))
      val tboth = withIds.where($"tags".getItem("tboth").isNotNull)
        .select($"id", lit("tboth").as("tbl"), $"rel_ids")
      // t2 insert is guarded by `osm2pgsql.stage == 2 and ids`
      if (!stage2) t1.unionByName(tboth)
      else t1
        .unionByName(withIds
          .where($"tags".getItem("t2").isNotNull && $"rel_ids".isNotNull)
          .select($"id", lit("t2").as("tbl"), $"rel_ids"))
        .unionByName(tboth)
    }

    val rows = TwoStage.run(entities, osm.relations,
      selectRelationMembers = r => r.select(explode(transform(
        filter($"members", m =>
          m.getField("mtype") === mtype && m.getField("role") === "mark"),
        m => m.getField("ref")))),
      processStage1 = stageRows(_, stage2 = false),
      processStage2 = stageRows(_, stage2 = true))
      .select($"tbl", $"id", $"rel_ids")
      .as[(String, Long, Option[String])].collect()

    (rows.collect { case ("t1", id, _) => id }.toSet,
      rows.collect { case ("t2", id, r) => id -> r }.toMap,
      rows.collect { case ("tboth", id, r) => id -> r }.toMap)
  }

  private def checkScenario(s: Scn, mtype: String,
      prefix: String = ""): Unit = {
    val base = OsmText.toFrames(spark, prefix + "\n" + s.base)
    val (t1b, t2b, tbothb) = flexTables(base, mtype)
    assert(t1b == s.before.t1, s"${s.name}: t1 before")
    assert(t2b == s.before.t2, s"${s.name}: t2 before")
    assert(tbothb == s.before.tboth, s"${s.name}: tboth before")

    val after = ClassicUpdate.applyChanges(base,
      OsmText.toFrames(spark, s.diff, change = true))
    val (t1a, t2a, tbotha) = flexTables(after, mtype)
    assert(t1a == s.after.t1, s"${s.name}: t1 after")
    assert(t2a == s.after.t2, s"${s.name}: t2 after")
    assert(tbotha == s.after.tboth, s"${s.name}: tboth after")
  }

  // ---- shared fixtures (way family) ----

  // way-add/way-del background: w10 absent, w12/w14 marked by r30
  private val wBase = """
    w11 v1 dV Tt1=yes Nn12,n13
    w12 v1 dV Tt2=yes Nn14,n15
    w13 v1 dV Ttboth=yes Nn16,n17
    w14 v1 dV Ttboth=yes Nn18,n19
    r30 v1 dV Tt=ag Mw11@,w12@mark,w13@,w14@mark
  """
  private val init = Exp(Set(11), Map(12L -> Some("{30}")),
    Map(13L -> None, 14L -> Some("{30}")))

  private def exp(t1: Set[Long], t2: (Long, String)*): Exp =
    Exp(t1, t2.map { case (k, v) => k -> Some(v) }.toMap ++
      Map(12L -> Some("{30}")),
      Map(13L -> None, 14L -> Some("{30}")))

  test("way-add.feature: adding ways to a flex database") {
    val r30v2 = (w10role: String) =>
      s"r30 v2 dV Tt=ag Mw10@$w10role,w11@,w12@mark,w13@,w14@mark"
    val scns = Seq(
      Scn("way is not relevant", wBase,
        s"w10 v1 dV Tt=ag Nn10,n11\n${r30v2("")}", init, init),
      Scn("add to t1", wBase,
        s"w10 v1 dV Tt1=yes Nn10,n11\n${r30v2("")}", init,
        exp(Set(10, 11))),
      Scn("add to t2", wBase,
        s"w10 v1 dV Tt2=yes Nn10,n11\n${r30v2("mark")}", init,
        exp(Set(11), 10L -> "{30}")),
      Scn("add to t1 and t2", wBase,
        s"w10 v1 dV Tt1=yes,t2=yes Nn10,n11\n${r30v2("mark")}", init,
        exp(Set(10, 11), 10L -> "{30}")),
      Scn("add to tboth (only stage1)", wBase,
        s"w10 v1 dV Ttboth=yes Nn10,n11\n${r30v2("")}", init,
        init.copy(tboth = init.tboth + (10L -> None))),
      Scn("add to tboth (stage1 and stage2)", wBase,
        s"w10 v1 dV Ttboth=yes Nn10,n11\n${r30v2("mark")}", init,
        init.copy(tboth = init.tboth + (10L -> Some("{30}")))))
    scns.foreach(checkScenario(_, "w", grid))
  }

  test("way-del.feature: deleting ways in a 2-stage flex database") {
    def base(w10: String, w10role: Option[String]) = s"""
      w10 v1 dV $w10 Nn10,n11
      w11 v1 dV Tt1=yes Nn12,n13
      w12 v1 dV Tt2=yes Nn14,n15
      w13 v1 dV Ttboth=yes Nn16,n17
      w14 v1 dV Ttboth=yes Nn18,n19
      r30 v1 dV Tt=ag M${w10role.map(r => s"w10@$r,").getOrElse("")}w11@,w12@mark,w13@,w14@mark
    """
    val del = "w10 v2 dD"
    val scns = Seq(
      Scn("del: not member, not in tables", base("Tt=ag", None), del,
        init, init),
      Scn("del: not member, in t1", base("Tt1=yes", None), del,
        exp(Set(10, 11)), init),
      Scn("del: not member, in tboth", base("Ttboth=yes", None), del,
        init.copy(tboth = init.tboth + (10L -> None)), init),
      Scn("del: member, not in tables", base("Tt=ag", Some("")), del,
        init, init),
      Scn("del: member, in t1", base("Tt1=yes", Some("")), del,
        exp(Set(10, 11)), init),
      Scn("del: member, in t2", base("Tt2=yes", Some("mark")), del,
        exp(Set(11), 10L -> "{30}"), init),
      Scn("del: member, in t1+t2", base("Tt1=yes,t2=yes", Some("mark")),
        del, exp(Set(10, 11), 10L -> "{30}"), init),
      Scn("del: member(mark), in tboth", base("Ttboth=yes", Some("mark")),
        del, init.copy(tboth = init.tboth + (10L -> Some("{30}"))), init),
      Scn("del: member(no role), in tboth", base("Ttboth=yes", Some("")),
        del, init.copy(tboth = init.tboth + (10L -> None)), init))
    scns.foreach(checkScenario(_, "w", grid))
  }

  test("way-change.feature: changing ways in a flex database") {
    // background marks w10 too: r30 Mw10@mark,w11@,w12@mark,...
    def base(w10tags: String, w10refs: String = "Nn10,n11") = s"""
      w10 v1 dV $w10tags $w10refs
      w11 v1 dV Tt1=yes Nn12,n13
      w12 v1 dV Tt2=yes Nn14,n15
      w13 v1 dV Ttboth=yes Nn16,n17
      w14 v1 dV Ttboth=yes Nn18,n19
      r30 v1 dV Tt=ag Mw10@mark,w11@,w12@mark,w13@,w14@mark
    """
    val scns = Seq(
      Scn("change from t1 → t2", base("Tt1=yes"),
        "w10 v2 dV Tt2=yes Nn10,n11",
        exp(Set(10, 11)), exp(Set(11), 10L -> "{30}")),
      Scn("change from t1 → t1+t2", base("Tt1=yes"),
        "w10 v2 dV Tt1=yes,t2=yes Nn10,n11",
        exp(Set(10, 11)), exp(Set(10, 11), 10L -> "{30}")),
      Scn("change from t2 → t1", base("Tt2=yes"),
        "w10 v2 dV Tt1=yes Nn10,n11",
        exp(Set(11), 10L -> "{30}"), exp(Set(10, 11))),
      Scn("change from t2 → t1+t2", base("Tt2=yes"),
        "w10 v2 dV Tt1=yes,t2=yes Nn10,n11",
        exp(Set(11), 10L -> "{30}"), exp(Set(10, 11), 10L -> "{30}")),
      Scn("change from t1+t2 → t1", base("Tt1=yes,t2=yes"),
        "w10 v2 dV Tt1=yes Nn10,n11",
        exp(Set(10, 11), 10L -> "{30}"), exp(Set(10, 11))),
      Scn("change from t1+t2 → t2", base("Tt1=yes,t2=yes"),
        "w10 v2 dV Tt2=yes Nn10,n11",
        exp(Set(10, 11), 10L -> "{30}"), exp(Set(11), 10L -> "{30}")),
      Scn("valid geom → invalid (single ref)",
        base("Tt1=yes,t2=yes,tboth=yes"),
        "w10 v2 dV Tt1=yes,t2=yes,tboth=yes Nn10",
        Exp(Set(10, 11), Map(10L -> Some("{30}"), 12L -> Some("{30}")),
          Map(10L -> Some("{30}"), 13L -> None, 14L -> Some("{30}"))),
        init),
      Scn("valid geom → invalid (node onto node)",
        base("Tt1=yes,t2=yes,tboth=yes"),
        "n11 v2 dV x10.0 y10.0", // n11 lands on n10 → degenerate line
        Exp(Set(10, 11), Map(10L -> Some("{30}"), 12L -> Some("{30}")),
          Map(10L -> Some("{30}"), 13L -> None, 14L -> Some("{30}"))),
        init),
      Scn("invalid geom → valid",
        base("Tt1=yes,t2=yes,tboth=yes", "Nn10"),
        "w10 v2 dV Tt1=yes,t2=yes,tboth=yes Nn10,n11",
        init,
        Exp(Set(10, 11), Map(10L -> Some("{30}"), 12L -> Some("{30}")),
          Map(10L -> Some("{30}"), 13L -> None, 14L -> Some("{30}")))))
    scns.foreach(checkScenario(_, "w", grid))
  }

  // way-relation-add/del background: w15 exists, r30 does NOT mark w10
  private def relBase(w10tags: String, extraRels: String*) = (s"""
    w10 v1 dV $w10tags Nn10,n11
    w11 v1 dV Tt1=yes Nn12,n13
    w12 v1 dV Tt2=yes Nn14,n15
    w13 v1 dV Ttboth=yes Nn16,n17
    w14 v1 dV Ttboth=yes Nn18,n19
    w15 v1 dV Tt=ag Nn17,n19
    r30 v1 dV Tt=ag Mw10@,w11@,w12@mark,w13@,w14@mark
  """ +: extraRels).mkString("\n")

  test("way-relation-add.feature: adding relations (2-stage)") {
    val r31mark = "r31 v1 dV Tt=ag Mw10@mark,w11@,w12@,w13@,w14@"
    val r31plain = "r31 v1 dV Tt=ag Mw10@,w11@,w12@,w13@,w14@"
    val r32mark = "r32 v2 dV Tt=ag Mw10@mark,w11@,w12@,w13@,w14@,w15@"
    val r32plain = "r32 v2 dV Tt=ag Mw10@,w11@,w12@,w13@,w14@,w15@"
    val scns = Seq(
      Scn("add rel, way in t1 (marked)", relBase("Tt1=yes,t2=yes"),
        r32mark, exp(Set(10, 11)), exp(Set(10, 11), 10L -> "{32}")),
      Scn("add rel, way in t1 (marked), rel pre-exists",
        relBase("Tt1=yes,t2=yes",
          "r32 v1 dV Tt=ag Mw11@,w12@,w13@,w14@,w15@"),
        r32mark, exp(Set(10, 11)), exp(Set(10, 11), 10L -> "{32}")),
      Scn("add rel, way in t2 (marked)", relBase("Tt2=yes", r31mark),
        r32mark, exp(Set(11), 10L -> "{31}"),
        exp(Set(11), 10L -> "{31,32}")),
      Scn("add rel, way in t1 and t2 (marked)",
        relBase("Tt1=yes,t2=yes", r31mark),
        r32mark, exp(Set(10, 11), 10L -> "{31}"),
        exp(Set(10, 11), 10L -> "{31,32}")),
      Scn("add rel, way in tboth stage 1 (marked)",
        relBase("Ttboth=yes", r31plain),
        r32mark, init.copy(tboth = init.tboth + (10L -> None)),
        init.copy(tboth = init.tboth + (10L -> Some("{32}")))),
      Scn("add to rel, way in tboth stage 1 (marked)",
        relBase("Ttboth=yes",
          "r32 v1 dV Tt=ag Mw10@,w11@,w12@,w13@,w14@,w15@"),
        r32mark, init.copy(tboth = init.tboth + (10L -> None)),
        init.copy(tboth = init.tboth + (10L -> Some("{32}")))),
      Scn("add rel, way in tboth stage 2 (marked)",
        relBase("Ttboth=yes", r31mark),
        r32mark, init.copy(tboth = init.tboth + (10L -> Some("{31}"))),
        init.copy(tboth = init.tboth + (10L -> Some("{31,32}")))),
      Scn("add rel, way in t1 (not marked)", relBase("Tt1=yes,t2=yes"),
        r32plain, exp(Set(10, 11)), exp(Set(10, 11))),
      Scn("add rel, way in t1 (not marked), rel pre-exists",
        relBase("Tt1=yes,t2=yes",
          "r32 v1 dV Tt=ag Mw11@,w12@,w13@,w14@,w15@"),
        r32plain, exp(Set(10, 11)), exp(Set(10, 11))),
      Scn("add rel, way in t2 (not marked → marked)",
        relBase("Tt2=yes", r31mark),
        r32mark, exp(Set(11), 10L -> "{31}"),
        exp(Set(11), 10L -> "{31,32}")),
      Scn("add rel, way in t1 and t2 (not marked)",
        relBase("Tt1=yes,t2=yes", r31mark),
        r32plain, exp(Set(10, 11), 10L -> "{31}"),
        exp(Set(10, 11), 10L -> "{31}")),
      Scn("add rel, way in tboth stage 1 (not marked)",
        relBase("Ttboth=yes", r31plain),
        r32plain, init.copy(tboth = init.tboth + (10L -> None)),
        init.copy(tboth = init.tboth + (10L -> None))),
      Scn("add rel, way in tboth stage 2 (not marked)",
        relBase("Ttboth=yes", r31mark),
        r32plain, init.copy(tboth = init.tboth + (10L -> Some("{31}"))),
        init.copy(tboth = init.tboth + (10L -> Some("{31}")))))
    scns.foreach(checkScenario(_, "w", grid))
  }

  test("way-relation-del.feature: deleting relations (stage-2)") {
    val r31 = "r31 v1 dV Tt=ag Mw10@mark"
    val r32 = "r32 v1 dV Tt=ag Mw10@mark,w11@,w12@,w13@,w14@,w15@"
    val r32noW10 = "r32 v1 dV Tt=ag Mw11@,w12@,w13@,w14@,w15@"
    // both Examples rows: hard delete, and modify-dropping-the-member
    val drops = Seq("r32 v2 dD",
      "r32 v2 dV Tt=ag Mw11@,w12@,w13@,w14@,w15@")
    val scns = drops.flatMap { drop =>
      Seq(
        Scn(s"del rel, way not in rel [$drop]",
          relBase("Tt=ag", r32noW10), drop, init, init),
        Scn(s"del rel, way in t1 [$drop]",
          relBase("Tt1=yes", r32noW10), drop,
          exp(Set(10, 11)), exp(Set(10, 11))),
        Scn(s"del rel, way in t2 (multi) [$drop]",
          relBase("Tt2=yes", r31, r32), drop,
          exp(Set(11), 10L -> "{31,32}"), exp(Set(11), 10L -> "{31}")),
        Scn(s"del rel, way in t2 (single) [$drop]",
          relBase("Tt2=yes", r32), drop,
          exp(Set(11), 10L -> "{32}"), exp(Set(11))),
        Scn(s"del rel, way in t1+t2 (multi) [$drop]",
          relBase("Tt1=yes,t2=yes", r31, r32), drop,
          exp(Set(10, 11), 10L -> "{31,32}"),
          exp(Set(10, 11), 10L -> "{31}")),
        Scn(s"del rel, way in t1+t2 (single) [$drop]",
          relBase("Tt1=yes,t2=yes", r32), drop,
          exp(Set(10, 11), 10L -> "{32}"), exp(Set(10, 11))),
        Scn(s"del rel, way in tboth (multi) [$drop]",
          relBase("Ttboth=yes", r31, r32), drop,
          init.copy(tboth = init.tboth + (10L -> Some("{31,32}"))),
          init.copy(tboth = init.tboth + (10L -> Some("{31}")))),
        Scn(s"del rel, way in tboth (single) [$drop]",
          relBase("Ttboth=yes", r32), drop,
          init.copy(tboth = init.tboth + (10L -> Some("{32}"))),
          init.copy(tboth = init.tboth + (10L -> None))))
    }
    scns.foreach(checkScenario(_, "w", grid))
  }

  test("node-add.feature: adding nodes to a flex database") {
    val nBase = """
      n11 v1 dV Tt1=yes x1 y1
      n12 v1 dV Tt2=yes x2 y2
      n13 v1 dV Ttboth=yes x3 y3
      n14 v1 dV Ttboth=yes x4 y4
      r30 v1 dV Tt=ag Mn11@,n12@mark,n13@,n14@mark
    """
    val r30v2 = (role: String) =>
      s"r30 v2 dV Tt=ag Mn10@$role,n11@,n12@mark,n13@,n14@mark"
    val scns = Seq(
      Scn("node is not relevant", nBase,
        s"n10 v1 dV Tt=ag x0 y0\n${r30v2("")}", init, init),
      Scn("add to t1", nBase,
        s"n10 v1 dV Tt1=yes x0 y0\n${r30v2("")}", init,
        exp(Set(10, 11))),
      Scn("add to t2", nBase,
        s"n10 v1 dV Tt2=yes x0 y0\n${r30v2("mark")}", init,
        exp(Set(11), 10L -> "{30}")),
      Scn("add to t1 and t2", nBase,
        s"n10 v1 dV Tt1=yes,t2=yes x0 y0\n${r30v2("mark")}", init,
        exp(Set(10, 11), 10L -> "{30}")),
      Scn("add to tboth (only stage1)", nBase,
        s"n10 v1 dV Ttboth=yes x0 y0\n${r30v2("")}", init,
        init.copy(tboth = init.tboth + (10L -> None))),
      Scn("add to tboth (stage1 and stage2)", nBase,
        s"n10 v1 dV Ttboth=yes x0 y0\n${r30v2("mark")}", init,
        init.copy(tboth = init.tboth + (10L -> Some("{30}")))))
    scns.foreach(checkScenario(_, "n", ""))
  }
}
