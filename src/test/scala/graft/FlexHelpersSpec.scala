package graft

import org.apache.spark.sql.functions._

import graft.flex.{Helpers, TwoStage}
import graft.model.{OsmMember, OsmRelation, OsmWay}

class FlexHelpersSpec extends SparkSpecBase {
  import spark.implicits._

  test("helper library: prefix/suffix/clamp/split/check/memberIds") {
    val df = Seq(("addr:city", "10 km", "primary")).toDF("k", "w", "h")
    val row = df.select(
      Helpers.hasPrefix($"k", "addr:").as("p"),
      Helpers.hasSuffix($"k", "city").as("s"),
      Helpers.clamp(lit(15), lit(0), lit(10)).as("c"),
      Helpers.splitUnit($"w", "m").as("u"),
      Helpers.checkValues(Seq("primary", "secondary"))($"h").as("ok"),
      Helpers.checkValues(Seq("secondary"), Some("other"))($"h").as("dflt"),
      Helpers.splitString(lit("a; b ;c")).as("parts"))
      .collect().head
    assert(row.getBoolean(0) && row.getBoolean(1))
    assert(row.getInt(2) == 10)
    val u = row.getStruct(3)
    assert(u.getDouble(0) == 10.0 && u.getString(1) == "km")
    assert(row.getString(4) == "primary")
    assert(row.getString(5) == "other")
    assert(row.getSeq[String](6) == Seq("a", "b", "c"))

    val rels = Seq(OsmRelation(1, members = Seq(
      OsmMember("n", 5, ""), OsmMember("w", 7, ""), OsmMember("w", 9, ""))))
      .toDF()
    val ids = rels.select(
      Helpers.memberIds($"members", "w", typeField = "mtype").as("w"),
      Helpers.memberIds($"members", "n", typeField = "mtype").as("n"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(ids == ((Seq(7L, 9L), Seq(5L))))
  }

  test("two-stage: marked ways re-processed with relation context") {
    val ways = Seq(
      OsmWay(1, tags = Map("highway" -> "primary")),
      OsmWay(2, tags = Map("highway" -> "residential")),
      OsmWay(3, tags = Map("highway" -> "service"))).toDF()
    val rels = Seq(OsmRelation(10,
      members = Seq(OsmMember("w", 1, ""), OsmMember("w", 3, "")),
      tags = Map("type" -> "route", "route" -> "bus"))).toDF()

    val out = TwoStage.run(ways, rels,
      selectRelationMembers = r => r
        .where($"tags".getItem("type") === "route")
        .select(explode(Helpers.memberIds($"members", "w",
          typeField = "mtype"))),
      processStage1 = w => w.select($"id", lit(1).as("stage"),
        lit(null).cast("string").as("route")),
      processStage2 = w => w.select($"id", lit(2).as("stage"),
        lit("bus").as("route")))

    val m = out.select($"id", $"stage", $"route")
      .as[(Long, Int, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) == ((2, Some("bus"))))
    assert(m(2L) == ((1, None)))
    assert(m(3L) == ((2, Some("bus"))))
  }
}
