package graft.lua

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.flex.{Enrich, FlexRunner, LuaFlexConfig}
import graft.sources.OsmText

/** Port of command-line/test_style.feature: generic.lua over the
  * feature's two nodes through the Lua runtime, asserting the
  * matcher semantics the feature exercises (case-insensitive,
  * regex, substring, json-object equality, float tolerance) against
  * the landed rows. Previously a sanctioned delta — the feature
  * needs a real Lua style load. */
class TestStyleFeatureSpec extends SparkSpecBase {

  import spark.implicits._

  test("generic.lua over the feature's nodes; matcher assertions") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/flex-config/generic.lua")),
      java.nio.charset.StandardCharsets.UTF_8)
    val osm = Enrich.forFlex(OsmText.toFrames(spark, """
      n10 v1 dV Tname=Afeat,access=yes x1 y4
      n11 v1 dV Tname=B-feat-Ö,access=no x34.5 y-1.5
      """), "create")
    val r = FlexRunner.run(new LuaFlexConfig(src, "generic.lua"), osm)
    val points = r.tables("points").rows
      .select($"node_id", $"tags", $"geom").collect()
      .map(row => row.getLong(0) ->
        (row.getString(1), row.getAs[Array[Byte]](2))).toMap
    assert(points.keySet == Set(10L, 11L))

    def tagOf(json: String, key: String): String = {
      val m = s""""$key":"((?:[^"\\\\]|\\\\.)*)"""".r
      m.findFirstMatchIn(json).map(_.group(1)).getOrElse(null)
    }
    // case-insensitive field match (!i)
    assert(tagOf(points(10L)._1, "name").equalsIgnoreCase("AFEAT"))
    assert(tagOf(points(11L)._1, "name").equalsIgnoreCase("b-feat-ö"))
    assert(tagOf(points(10L)._1, "name") != "AFEAT") // exact differs
    // regex matches (!re)
    assert(points(10L)._1.matches(".*access.*"))
    assert(tagOf(points(11L)._1, "name").matches(".*-[a-zö]+-.*"))
    // substring (!substr)
    assert(tagOf(points(10L)._1, "name").contains("feat"))
    assert(tagOf(points(11L)._1, "name").contains("feat"))
    // json-object equality is key-order independent
    assert(tagOf(points(10L)._1, "name") == "Afeat" &&
      tagOf(points(10L)._1, "access") == "yes")
    // float tolerance on the projected X (!~): node 11 at lon 34.5 →
    // 3857 X ≈ 3840522; node 10 at lon 1 → 111319.5 (1 decimal)
    val x11 = graft.geom.Ewkb.decode(points(11L)._2) match {
      case p: graft.geom.Point => p.x
      case g => fail(s"unexpected $g")
    }
    assert(math.abs(x11 - 3840522.0) <= 0.5)
    assert(math.abs(x11 - 3840522.0) > 0.1)
    assert(math.abs(x11 - 3840000.0) <= 0.01 * 3840000.0)
    val x10 = graft.geom.Ewkb.decode(points(10L)._2) match {
      case p: graft.geom.Point => p.x
      case g => fail(s"unexpected $g")
    }
    assert("%.1f".formatLocal(java.util.Locale.ROOT, x10) == "111319.5")
  }
}
