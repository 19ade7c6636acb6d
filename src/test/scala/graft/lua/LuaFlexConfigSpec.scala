package graft.lua

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.flex._
import graft.sources.OsmText

/** End-to-end Lua config execution: real reference semantics over
  * the executor path (mapPartitions Lua states), verified against
  * small fixtures and — the strong check — the reference's own
  * simple.lua over Liechtenstein against the typed port's pinned
  * counts. Closes flex/empty-insert.feature and
  * flex/invalid-lua.feature, which need a real Lua runtime. */
class LuaFlexConfigSpec extends SparkSpecBase {

  import spark.implicits._

  private def runLua(src: String, osmText: String)
      : graft.flex.FlexRunner.Result = {
    val osm = Enrich.forFlex(OsmText.toFrames(spark, osmText), "create")
    FlexRunner.run(new LuaFlexConfig(src), osm)
  }

  test("node inserts: tags, grab_tag, json, as_point, not_null protocol") {
    val r = runLua(
      """local pois = osm2pgsql.define_table{
        |  name = 'pois',
        |  ids = { type = 'node', id_column = 'node_id' },
        |  columns = {
        |    { column = 'name', type = 'text' },
        |    { column = 'tags', type = 'jsonb' },
        |    { column = 'rating', type = 'int4' },
        |    { column = 'geom', type = 'point', not_null = true },
        |  }}
        |function osm2pgsql.process_node(object)
        |  local name = object:grab_tag('name')
        |  local ok = pois:insert{
        |    name = name,
        |    tags = object.tags,
        |    rating = object.tags.rating,
        |    geom = object:as_point()
        |  }
        |  assert(ok == true)
        |end
        |""".stripMargin,
      """
      n1 v1 dV Tname=cafe,rating=4,cuisine=x x10.0 y10.0
      n2 v1 dV Tname=bar x10.3 y10.0
      """)
    val pois = r.tables("pois").rows
      .select($"node_id", $"name", $"tags", $"rating")
      .as[(Long, String, String, Option[Int])].collect().sortBy(_._1)
    assert(pois.length == 2)
    // grab_tag removed 'name' from tags before the json serialize
    assert(pois(0)._2 == "cafe")
    assert(!pois(0)._3.contains("name"))
    assert(pois(0)._3.contains("\"rating\":\"4\""))
    assert(pois(0)._4.contains(4))
    assert(pois(1) == ((2L, "bar", "{}", None)))
  }

  test("empty insert errors like the reference (empty-insert.feature)") {
    val e = intercept[Exception] {
      runLua(
        """local points = osm2pgsql.define_table{
          |  name = 'osm2pgsql_test_points',
          |  ids = { type = 'node', id_column = 'node_id' },
          |  columns = {
          |    { column = 'geom', type = 'point' },
          |  }}
          |function osm2pgsql.process_node(object)
          |  points:insert()
          |end
          |""".stripMargin,
        "n1 v1 dV Tnatural=water x1 y2"
      ).tables("osm2pgsql_test_points").rows.count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("Need two parameters")))
  }

  test("invalid lua config fails at load (invalid-lua.feature)") {
    val e = intercept[Exception](
      new LuaFlexConfig("this-is-not-valid-lua").tables)
    assert(e.getMessage != null)
  }

  test("not-null violation returns the reference's 4-value protocol") {
    val r = runLua(
      """local t = osm2pgsql.define_table{
        |  name = 't',
        |  ids = { type = 'node', id_column = 'node_id' },
        |  columns = {
        |    { column = 'name', type = 'text', not_null = true },
        |    { column = 'geom', type = 'point' },
        |  }}
        |function osm2pgsql.process_node(object)
        |  local ok, msg, colname, obj = t:insert{
        |    name = object.tags.name,
        |    geom = object:as_point()
        |  }
        |  if not ok then
        |    assert(msg == 'null value in not null column.')
        |    assert(colname == 'name')
        |    assert(obj.id == object.id)
        |  end
        |end
        |""".stripMargin,
      """
      n1 v1 dV Tname=a x1 y1
      n2 v1 dV Tamenity=pub x2 y2
      """)
    // n2's row is NOT written (reference rolls the line back)
    assert(r.tables("t").rows.select($"node_id").as[Long].collect()
      .toSeq == Seq(1L))
  }

  test("way pass: linestring/polygon routing on is_closed, hstore tags") {
    val r = runLua(
      """local lines = osm2pgsql.define_table{
        |  name = 'lines',
        |  ids = { type = 'way', id_column = 'way_id' },
        |  columns = {
        |    { column = 'tags', type = 'hstore' },
        |    { column = 'geom', type = 'linestring', not_null = true },
        |  }}
        |local polys = osm2pgsql.define_table{
        |  name = 'polys',
        |  ids = { type = 'area', id_column = 'area_id' },
        |  columns = {
        |    { column = 'geom', type = 'polygon', not_null = true },
        |    { column = 'sqm', type = 'real' },
        |  }}
        |function osm2pgsql.process_way(object)
        |  if object.is_closed then
        |    local g = object:as_polygon():transform(3857)
        |    polys:insert{ geom = g, sqm = g:area() }
        |  else
        |    lines:insert{ tags = object.tags,
        |                  geom = object:as_linestring():transform(3857) }
        |  end
        |end
        |""".stripMargin,
      """
      n1 v1 dV x0.0 y0.0
      n2 v1 dV x0.1 y0.0
      n3 v1 dV x0.1 y0.1
      n4 v1 dV x2.0 y2.0
      w10 v1 dV Thighway=path Nn1,n2,n4
      w11 v1 dV Tbuilding=yes Nn1,n2,n3,n1
      """)
    val lines = r.tables("lines").rows
    assert(lines.select($"way_id").as[Long].collect().toSeq == Seq(10L))
    val tags = lines.select($"tags").as[Map[String, String]].head()
    assert(tags == Map("highway" -> "path"))
    val polys = r.tables("polys").rows
      .select($"area_id", $"sqm").as[(Long, Float)].collect()
    assert(polys.map(_._1).toSeq == Seq(11L))
    assert(polys.head._2 > 0.0f)
  }

  test("relation multipolygon into area table maps to negative ids") {
    val r = runLua(
      """local polys = osm2pgsql.define_table{
        |  name = 'polys',
        |  ids = { type = 'area', id_column = 'area_id' },
        |  columns = {
        |    { column = 'kind', type = 'text' },
        |    { column = 'geom', type = 'multipolygon', not_null = true },
        |  }}
        |function osm2pgsql.process_way(object)
        |  if object.is_closed and object.tags.natural then
        |    polys:insert{ kind = 'w',
        |      geom = object:as_multipolygon():transform(3857) }
        |  end
        |end
        |function osm2pgsql.process_relation(object)
        |  if object.tags.type == 'multipolygon' then
        |    polys:insert{ kind = 'r',
        |      geom = object:as_multipolygon():transform(3857) }
        |  end
        |end
        |""".stripMargin,
      """
      n1 v1 dV x0.0 y0.0
      n2 v1 dV x1.0 y0.0
      n3 v1 dV x1.0 y1.0
      n4 v1 dV x0.0 y1.0
      w10 v1 dV Tnatural=water Nn1,n2,n3,n4,n1
      w11 v1 dV Nn1,n2,n3,n4,n1
      r30 v1 dV Ttype=multipolygon Mw11@outer
      """)
    val rows = r.tables("polys").rows
      .select($"area_id", $"kind").as[(Long, String)].collect().toSet
    assert(rows == Set((10L, "w"), (-30L, "r")))
    // the geom column read back as MULTIPOLYGON (wrap_multi)
    val g = graft.geom.Ewkb.decode(r.tables("polys").rows
      .where($"kind" === "r").select($"geom").as[Array[Byte]].head())
    assert(g.isInstanceOf[graft.geom.MultiPolygon])
  }

  test("two-stage: select_relation_members reprocesses marked ways") {
    val r = runLua(
      """local routes = osm2pgsql.define_table{
        |  name = 'route_ways',
        |  ids = { type = 'way', id_column = 'way_id' },
        |  columns = {
        |    { column = 'refs', type = 'text' },
        |    { column = 'stage', type = 'int2' },
        |  }}
        |local w2r = {}
        |function osm2pgsql.select_relation_members(relation)
        |  if relation.tags.type == 'route' then
        |    return { ways = osm2pgsql.way_member_ids(relation) }
        |  end
        |end
        |function osm2pgsql.process_relation(object)
        |  if object.tags.type == 'route' then
        |    for _, m in ipairs(object.members) do
        |      if m.type == 'w' then
        |        if not w2r[m.ref] then w2r[m.ref] = {} end
        |        w2r[m.ref][#w2r[m.ref] + 1] = object.tags.ref
        |      end
        |    end
        |  end
        |end
        |function osm2pgsql.process_way(object)
        |  if not object.tags.highway then return end
        |  local refs = nil
        |  if w2r[object.id] then
        |    refs = table.concat(w2r[object.id], ',')
        |  end
        |  routes:insert{ refs = refs, stage = osm2pgsql.stage }
        |end
        |""".stripMargin,
      """
      n1 v1 dV x0.0 y0.0
      n2 v1 dV x1.0 y0.0
      n3 v1 dV x2.0 y0.0
      w10 v1 dV Thighway=primary Nn1,n2
      w11 v1 dV Thighway=primary Nn2,n3
      w12 v1 dV Thighway=service Nn1,n3
      r30 v1 dV Ttype=route,ref=B1 Mw10@,w11@
      """)
    val rows = r.tables("route_ways").rows
      .select($"way_id", $"refs", $"stage")
      .as[(Long, Option[String], Short)].collect().sortBy(_._1)
    // w10/w11 marked → reprocessed in stage 2 WITH the relation info;
    // w12 unmarked → stage-1 row only (reference reprocess_marked)
    assert(rows.toSeq == Seq(
      (10L, Some("B1"), 2: Short),
      (11L, Some("B1"), 2: Short),
      (12L, None, 1: Short)))
  }

  test("untagged objects route to process_untagged_node") {
    val r = runLua(
      """local all = osm2pgsql.define_table{
        |  name = 'all_nodes',
        |  ids = { type = 'node', id_column = 'node_id' },
        |  columns = {
        |    { column = 'kind', type = 'text' },
        |  }}
        |function osm2pgsql.process_node(object)
        |  all:insert{ kind = 'tagged' }
        |end
        |function osm2pgsql.process_untagged_node(object)
        |  all:insert{ kind = 'untagged' }
        |end
        |""".stripMargin,
      """
      n1 v1 dV Tamenity=pub x1 y1
      n2 v1 dV x2 y2
      """)
    val rows = r.tables("all_nodes").rows
      .select($"node_id", $"kind").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "tagged"), (2L, "untagged")))
  }

  test("reference simple.lua over Liechtenstein matches the typed port") {
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    assume(new java.io.File(pbf).exists())
    val dir = java.nio.file.Files.createTempDirectory("graft-lua-simple")
    graft.cli.Main.run(spark, graft.cli.Options.parse(Seq(
      pbf, "-O", "flex", "-S", "/root/reference/flex-config/simple.lua",
      "--output-dir", s"$dir/out")))
    def cnt(t: String): Long = spark.read.parquet(s"$dir/out/$t").count()
    // same pinned counts as the typed graft.flex.examples.Simple port
    // (CliSpec example-config corpus test)
    assert(cnt("pois") == 1531L)
    assert(cnt("restaurants") == 31L)
    assert(cnt("ways") == 2990L)
    assert(cnt("polygons") == 4142L)
  }
}
