package graft

import org.apache.spark.sql.functions._

import graft.classic.ClassicUpdate
import graft.sinks.PgSink
import graft.sources.{OsmText, OsmXml}

/** Ports of tests/bdd/flex/tags.feature (tag values must survive the
  * COPY TEXT wire format byte-for-byte across text/hstore/json
  * columns) and tests/bdd/flex/id-cache.feature (the barriers-on-
  * highways pattern: in_id_cache is a join of way refs against the
  * already-inserted node table, recomputed across updates). */
class FlexTagsIdCacheSpec extends SparkSpecBase {

  import spark.implicits._

  test("tags.feature: names in different scripts survive every column form") {
    val names = Seq("Paris", "Nürnberg", "Plzeň", "Αθήνα", "תל־אביב-יפו",
      "عَمَّان", "北京", "ရန်ကုန်", "मुंबई")

    // text column: wire-escape + PG parse = identity
    names.foreach { n =>
      assert(PgSink.copyUnescape(PgSink.copyEscape(n)) == n)
    }
    // hstore column: the doubly-escaped pair form, unescaped twice
    names.foreach { n =>
      val wire = PgSink.hstoreCopyValue(Seq("name" -> n))
      val parsed = PgSink.copyUnescape(PgSink.copyUnescape(wire))
      assert(parsed == "\"name\"=>\"" + n + "\"", s"hstore $n")
    }
    // json column: to_json → get_json_object round trip
    val got = names.toDF("name")
      .select(get_json_object(to_json(map(lit("name"), $"name")),
        "$.name"))
      .as[String].collect().toSeq
    assert(got == names)
  }

  test("tags.feature: special characters through the COPY wire format") {
    // the feature's golden values (post-parse hex of the stored text)
    val cases = Seq(
      "" -> "",
      "< >" -> "3c203e",
      "<\t>" -> "3c093e",
      "<\u001b\n>" -> "3c1b0a3e",
      "<\u0001\u001f>" -> "3c011f3e")
    cases.foreach { case (v, hex) =>
      val stored = PgSink.copyUnescape(PgSink.copyEscape(v))
      assert(stored == v)
      val gotHex = stored.getBytes("UTF-8").map(b => f"$b%02x").mkString
      assert(gotHex == hex, s"hex of ${v.length}-char value")
    }
    // and the wire form itself: tab/newline escaped, control raw
    assert(PgSink.copyEscape("<\t>") == "<\\t>")
    assert(PgSink.copyEscape("<\u001b\n>") == "<\u001b\\n>")
    assert(PgSink.copyRow(Seq(Some("a\tb"), None, Some("c"))) ==
      "a\\tb\t\\N\tc")
    // hstore wire: quote and backslash take two escape levels
    assert(PgSink.hstoreCopyValue(Seq("k" -> "say \"hi\"")) ==
      "\"k\"=>\"say \\\\\"hi\\\\\"\"")
  }

  // ---- id-cache.feature ----

  /** barriers / highways / b_on_h from the id-cache style: in_id_cache
    * = semi-join of the way's refs against the barrier node ids. */
  private def idCacheTables(osm: OsmXml.OsmDataFrames) = {
    val barriers = osm.nodes
      .where($"tags".getItem("barrier").isNotNull)
      .select($"id".as("node_id"), $"tags".getItem("barrier").as("btype"))
    val highways = osm.ways
      .where($"tags".getItem("highway").isNotNull)
      .select($"id".as("way_id"), $"tags".getItem("highway").as("htype"),
        $"nodes")
    val bOnH = highways
      .select($"way_id", $"htype", $"nodes", explode($"nodes").as("ref"))
      .join(barriers, $"ref" === $"node_id")
      .select($"way_id", $"node_id", $"htype", $"nodes")
    (barriers.as[(Long, String)].collect().toSet,
      highways.select($"way_id", $"htype", $"nodes")
        .as[(Long, String, Seq[Long])].collect().toSet,
      bOnH.select($"way_id", $"node_id", $"htype", $"nodes")
        .as[(Long, Long, String, Seq[Long])].collect().toSet)
  }

  test("id-cache.feature: import and update") {
    val base = OsmText.toFrames(spark, """
      n10 v1 dV Tbarrier=gate x10.1 y10.1
      n11 v1 dV x10.2 y10.1
      n12 v1 dV x10.3 y10.1
      n14 v1 dV x10.0 y10.0
      n15 v1 dV x10.1 y10.0
      n16 v1 dV Tbarrier=lift_gate x10.3 y10.0
      w20 v1 dV Thighway=residential Nn10,n11,n12,n16
      w21 v1 dV Thighway=residential Nn14,n15,n10
    """)
    val (b0, h0, bh0) = idCacheTables(base)
    assert(b0 == Set((10L, "gate"), (16L, "lift_gate")))
    assert(h0 == Set(
      (20L, "residential", Seq(10L, 11L, 12L, 16L)),
      (21L, "residential", Seq(14L, 15L, 10L))))
    assert(bh0 == Set(
      (20L, 10L, "residential", Seq(10L, 11L, 12L, 16L)),
      (20L, 16L, "residential", Seq(10L, 11L, 12L, 16L)),
      (21L, 10L, "residential", Seq(14L, 15L, 10L))))

    // n10 stops being a barrier, n11 becomes one
    val after = ClassicUpdate.applyChanges(base, OsmText.toFrames(spark, """
      n10 v2 dV Tno=barrier x10.1 y10.1
      n11 v2 dV Tbarrier=gate x10.2 y10.1
    """, change = true))
    val (b1, h1, bh1) = idCacheTables(after)
    assert(b1 == Set((11L, "gate"), (16L, "lift_gate")))
    assert(h1 == h0)
    assert(bh1 == Set(
      (20L, 11L, "residential", Seq(10L, 11L, 12L, 16L)),
      (20L, 16L, "residential", Seq(10L, 11L, 12L, 16L))))
  }
}
