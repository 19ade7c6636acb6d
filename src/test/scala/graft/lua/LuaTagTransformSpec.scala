package graft.lua

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.classic.{ClassicPipeline, LuaTagTransform, StyleFile}
import graft.geom.Srid
import graft.sources.OsmText

/** `--tag-transform-script` with REAL Lua style scripts: the four
  * filter functions drive the classic pipeline through the embedded
  * runtime (reference: src/tagtransform-lua.cpp), and the reference's
  * own shipped style.lua reproduces the C-transform's table
  * membership over Liechtenstein. */
class LuaTagTransformSpec extends SparkSpecBase {

  import spark.implicits._

  private val style = """
    |function filter_tags_node(kv, n)
    |  if kv['amenity'] == nil then return 1, kv end
    |  return 0, { kind = kv['amenity'] }
    |end
    |function filter_tags_way(kv, n)
    |  if n == 0 then return 1, kv, 0, 0 end
    |  local polygon = (kv['building'] ~= nil) and 1 or 0
    |  local roads = (kv['highway'] == 'primary') and 1 or 0
    |  kv['z_order'] = roads == 1 and 7 or 0
    |  return 0, kv, polygon, roads
    |end
    |function filter_basic_tags_rel(kv, n)
    |  if kv['type'] == nil then return 1, kv end
    |  return 0, kv
    |end
    |function filter_tags_relation_member(kv, memberkv, roles, n)
    |  local polygon = 0
    |  local boundary = 0
    |  if kv['type'] == 'multipolygon' then polygon = 1 end
    |  if kv['type'] == 'boundary' then boundary = 1 end
    |  kv['type'] = nil
    |  -- member tags and roles are visible here
    |  kv['nmembers'] = n
    |  kv['role1'] = roles[1]
    |  if memberkv[1] then kv['m1name'] = memberkv[1]['name'] end
    |  return 0, kv, {}, boundary, polygon, 0
    |end
    |""".stripMargin

  private val data = """
    n1 v1 dV Tamenity=cafe,name=K x0.0 y0.0
    n2 v1 dV Ttourism=hotel x0.1 y0.0
    n3 v1 dV x0.2 y0.0
    n4 v1 dV x0.2 y0.1
    n5 v1 dV x0.3 y0.1
    n6 v1 dV x0.3 y0.0
    w20 v1 dV Tbuilding=yes Nn3,n4,n5,n3
    w21 v1 dV Thighway=primary Nn3,n5
    w22 v1 dV Tname=ring,natural=water Nn3,n4,n5,n6,n3
    r30 v1 dV Ttype=multipolygon,natural=water Mw22@outer
  """

  test("the four filter functions drive node/way/relation processing") {
    val osm = OsmText.toFrames(spark, data)
    val t = ClassicPipeline.run(osm, StyleFile.defaultStyle,
      srid = Srid.WGS84,
      tagTransform = LuaTagTransform.fromSource(style))

    val pts = t.point.select($"osm_id", $"tags")
      .as[(Long, Map[String, String])].collect().toMap
    assert(pts.keySet == Set(1L))
    assert(pts(1L) == Map("kind" -> "cafe"))

    // building → polygon; highway=primary → line + roads with the
    // Lua-computed z_order surfacing as the column; w22 (no building
    // key) stays a line by this style's rule even though closed
    assert(t.polygon.where($"osm_id" > 0).select($"osm_id").as[Long]
      .collect().toSet == Set(20L))
    val lines = t.line.select($"osm_id", $"z_order")
      .as[(Long, Int)].collect().toMap
    assert(lines.keySet == Set(21L, 22L))
    assert(lines(21L) == 7)
    assert(lines(22L) == 0)
    assert(t.roads.select($"osm_id").as[Long].collect().toSet == Set(21L))
    // z_order must not leak into the exported tag map
    assert(t.line.where(map_contains_key($"tags", "z_order"))
      .count() == 0L)

    // relation member pass: type=multipolygon → polygon with member
    // tags/roles visible to the function
    val rp = t.polygon.where($"osm_id" < 0)
      .select($"osm_id", $"tags").as[(Long, Map[String, String])]
      .collect().toMap
    assert(rp.keySet == Set(-30L))
    assert(rp(-30L)("nmembers") == "1")
    assert(rp(-30L)("role1") == "outer")
    assert(rp(-30L)("m1name") == "ring")
    assert(!rp(-30L).contains("type"))
  }

  test("missing filter function fails with the reference's text") {
    val e = intercept[IllegalArgumentException](
      LuaTagTransform.fromSource(
        "function filter_tags_node(kv, n) return 0, kv end"))
    assert(e.getMessage.contains(
      "Tag transform style does not contain a function filter_tags_way."))
    val e2 = intercept[IllegalArgumentException](
      LuaTagTransform.fromSource("this-is-not-valid-lua"))
    assert(e2.getMessage.startsWith("Lua tag transform style error:"))
  }

  test("the reference's shipped style.lua reproduces the C transform " +
      "over Liechtenstein (table membership)") {
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    assume(new java.io.File(pbf).exists())
    val osm = graft.sources.OsmPbf.read(spark, pbf)
    val c = ClassicPipeline.run(osm, StyleFile.defaultStyle,
      srid = Srid.WebMercator)
    val l = ClassicPipeline.run(osm, StyleFile.defaultStyle,
      srid = Srid.WebMercator,
      tagTransform = LuaTagTransform.fromFile("/root/reference/style.lua"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"osm_id").as[Long].collect().toSet
    def diff(name: String, a: Set[Long], b: Set[Long]): Unit =
      assert(a == b, s"$name: luaOnly=${(a -- b).toList.sorted.take(10)} " +
        s"cOnly=${(b -- a).toList.sorted.take(10)} " +
        s"(lua=${a.size} c=${b.size})")
    // the Lua style is the documented equivalent of the C transform:
    // same objects land in the same tables (import.feature goldens
    // 1342/4130 among them), EXCEPT one real divergence between the
    // reference's two shipped transforms: style.lua's generic_keys
    // includes 'type' (style.lua:92), so relation 5 (tags FIXME +
    // type=multipolygon; FIXME deleted) survives the Lua filter
    // while the C transform exports nothing for it. z_order VALUES
    // may differ (the Lua zordering table is the older scheme), so
    // membership is the cross-engine invariant.
    diff("point", ids(l.point), ids(c.point))
    diff("polygon", ids(l.polygon) - -5L, ids(c.polygon))
    diff("line", ids(l.line), ids(c.line))
    diff("roads", ids(l.roads), ids(c.roads))
    assert(ids(l.polygon).contains(-5L))
    assert(l.point.count() == 1342L)
  }
}
