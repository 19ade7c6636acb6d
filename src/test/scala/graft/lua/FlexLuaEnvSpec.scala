package graft.lua

import org.scalatest.funsuite.AnyFunSuite

import graft.flex._

/** Driver-side config loading through the Lua environment: the
  * reference's own flex-config Lua files must load and produce the
  * same table definitions as the hand-typed ports
  * (tests/test-output-flex-example-configs.cpp is load-only; this is
  * stronger — it checks the parsed defs). */
class FlexLuaEnvSpec extends AnyFunSuite {

  private val refCfg = "/root/reference/flex-config"

  private def load(path: String): FlexLuaEnv = {
    val env = new FlexLuaEnv(chunkName = path)
    env.loadSource(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
    env
  }

  test("simple.lua defines the 4 tables with the right shapes") {
    val env = load(s"$refCfg/simple.lua")
    assert(env.tableDefs.map(_.name).toSeq ==
      Seq("pois", "restaurants", "ways", "polygons"))
    val pois = env.tableDefs(0)
    assert(pois.ids == FlexIds.Node)
    assert(pois.idColumn == "node_id")
    assert(pois.columns.map(_.name) == Seq("tags", "geom"))
    assert(pois.columns.last.ctype == FlexType.Point)
    assert(pois.columns.last.notNull)
    val polygons = env.tableDefs(3)
    assert(polygons.ids == FlexIds.Area)
    assert(polygons.columns.find(_.name == "geom").get.ctype ==
      FlexType.Geometry)
    // process callbacks detected
    assert(env.callback("process_node").isDefined)
    assert(env.callback("process_way").isDefined)
    assert(env.callback("process_relation").isDefined)
  }

  test("generic.lua defines 5 tables; route-relations has stage 2") {
    val env = load(s"$refCfg/generic.lua")
    assert(env.tableDefs.size == 5)
    val env2 = load(s"$refCfg/route-relations.lua")
    assert(env2.callback("select_relation_members").isDefined)
  }

  test("all shipped example configs load through the Lua path") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(refCfg)
    val luaFiles = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".lua")).toSeq.sortBy(_.toString)
    assert(luaFiles.size >= 20)
    val failures = luaFiles.flatMap { f =>
      try { load(f.toString); None }
      catch { case e: Throwable => Some(s"$f: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("define_table validation errors match the reference texts") {
    def loadErr(src: String): String = {
      val env = new FlexLuaEnv()
      val e = intercept[Exception](env.loadSource(src))
      Option(e.getMessage).getOrElse("")
    }
    assert(loadErr("osm2pgsql.define_table{}")
      .contains("The table must contain a 'name' string field."))
    assert(loadErr(
      """osm2pgsql.define_table{name = 't', columns = {{column = 'a'}}}
        |osm2pgsql.define_table{name = 't', columns = {{column = 'a'}}}
        |""".stripMargin)
      .contains("Table with name 't' already exists."))
    assert(loadErr("osm2pgsql.define_table{name = 'x;y', columns = {}}")
      .contains("Special characters are not allowed"))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', ids = {type = 'foo', id_column = 'i'}, columns = {{column = 'a'}}}")
      .contains("Unknown ids type: foo."))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', ids = {type = 'way', id_column = 'i', cache = true}, columns = {{column = 'a'}}}")
      .contains("ID cache only available for node ids."))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', cluster = 'weird', columns = {{column = 'a'}}}")
      .contains("Unknown value 'weird' for 'cluster' table option"))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', columns = {{column = 'a', type = 'nope'}}}")
      .contains("Unknown column type 'nope'."))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', columns = {{column = 'a', projection = 4326}}}")
      .contains("Projection can only be set on geometry columns."))
    assert(loadErr(
      "osm2pgsql.define_table{name = 't', columns = {{column = 'g', type = 'point', projection = 4326, expire = {}}}}")
      .contains("Expire only allowed for geometry columns in Web Mercator"))
  }

  test("define_expire_output: range checks and accessors") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """eo = osm2pgsql.define_expire_output{
        |  filename = 'dirty', maxzoom = 12, minzoom = 10 }
        |fn = eo:filename(); mz = eo:maxzoom(); mnz = eo:minzoom()
        |""".stripMargin)
    assert(env.I.globals.rawGet(LStr("fn")) == LStr("dirty"))
    assert(env.I.globals.rawGet(LStr("mz")) == LInt(12))
    assert(env.I.globals.rawGet(LStr("mnz")) == LInt(10))
    val e = intercept[Exception](env.loadSource(
      "osm2pgsql.define_expire_output{filename = 'x', maxzoom = 25}"))
    assert(e.getMessage.contains(
      "The 'maxzoom' field in a expire output must be between 1 and 20."))
    val e2 = intercept[Exception](env.loadSource(
      "osm2pgsql.define_expire_output{maxzoom = 12}"))
    assert(e2.getMessage.contains(
      "Must set 'filename' and/or 'table' on expire output."))
  }

  test("expire refs recorded from column expire entries") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """local eo = osm2pgsql.define_expire_output{
        |  filename = 'dirty', maxzoom = 14 }
        |osm2pgsql.define_table{
        |  name = 'roads',
        |  ids = { type = 'way', id_column = 'way_id' },
        |  columns = {
        |    { column = 'geom', type = 'linestring',
        |      expire = {{ output = eo, mode = 'boundary-only',
        |                  buffer = 0.2 }} },
        |  }}
        |""".stripMargin)
    assert(env.expireRefs.toList == List(FlexLuaEnv.ExpireRef(
      0, "geom", 0, "boundary-only", 0.2, false, 10000.0)))
  }

  test("table wrapper accessors: name/schema/cluster/columns/tostring") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """t = osm2pgsql.define_table{
        |  name = 'pois', schema = 'osm',
        |  ids = { type = 'node', id_column = 'node_id' },
        |  columns = {
        |    { column = 'name', type = 'text', not_null = true },
        |    { column = 'geom', type = 'point' },
        |  }}
        |n = t:name(); s = t:schema(); c = t:cluster()
        |cols = t:columns()
        |col1name = cols[1].name
        |col1nn = cols[1].not_null
        |str = tostring(t)
        |""".stripMargin)
    val g = env.I.globals
    assert(g.rawGet(LStr("n")) == LStr("pois"))
    assert(g.rawGet(LStr("s")) == LStr("osm"))
    assert(g.rawGet(LStr("c")) == LBool(true))
    assert(g.rawGet(LStr("col1name")) == LStr("name"))
    assert(g.rawGet(LStr("col1nn")) == LBool(true))
    assert(g.rawGet(LStr("str")) == LStr("osm2pgsql.Table[pois]"))
  }

  test("init helpers: has_prefix/suffix, clamp, trim, split, check funcs") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """a = osm2pgsql.has_prefix('addr:city', 'addr:')
        |b = osm2pgsql.has_suffix('name:de', ':de')
        |c = osm2pgsql.clamp(11, 1, 10)
        |d = osm2pgsql.trim('  x y  ')
        |e = osm2pgsql.split_string('a; b;c')
        |e1, e2, e3 = e[1], e[2], e[3]
        |f1, f2 = osm2pgsql.split_unit('10 km', 'm')
        |g1, g2 = osm2pgsql.split_unit('3.5', 'm')
        |local check = osm2pgsql.make_check_values_func({'yes', 'no'}, 'yes')
        |h1 = check('no'); h2 = check('maybe')
        |local clean = osm2pgsql.make_clean_tags_func({'source', 'note*'})
        |tags = { source = 'x', note = 'y', ['note:de'] = 'z', name = 'N' }
        |i1 = clean(tags)
        |i2 = tags.name
        |i3 = tags.source
        |""".stripMargin)
    val g = env.I.globals
    assert(g.rawGet(LStr("a")) == LBool(true))
    assert(g.rawGet(LStr("b")) == LBool(true))
    assert(g.rawGet(LStr("c")) == LInt(10))
    assert(g.rawGet(LStr("d")) == LStr("x y"))
    assert(g.rawGet(LStr("e1")) == LStr("a"))
    assert(g.rawGet(LStr("e2")) == LStr("b"))
    assert(g.rawGet(LStr("e3")) == LStr("c"))
    assert(g.rawGet(LStr("f1")) == LInt(10))
    assert(g.rawGet(LStr("f2")) == LStr("km"))
    assert(g.rawGet(LStr("g1")) == LNum(3.5))
    assert(g.rawGet(LStr("g2")) == LStr("m"))
    assert(g.rawGet(LStr("h1")) == LStr("no"))
    assert(g.rawGet(LStr("h2")) == LStr("yes"))
    assert(g.rawGet(LStr("i1")) == LBool(false))
    assert(g.rawGet(LStr("i2")) == LStr("N"))
    assert(g.rawGet(LStr("i3")) == LNil)
  }

  test("object push + grab_tag + as_point/get_bbox for a node") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """function osm2pgsql.process_node(object)
        |  captured_id = object.id
        |  captured_v = object.version
        |  captured_name = object:grab_tag('name')
        |  captured_rest = object.tags.name
        |  local g = object:as_point()
        |  captured_type = g:geometry_type()
        |  captured_srid = g:srid()
        |  x1, y1, x2, y2 = object:get_bbox()
        |end
        |""".stripMargin)
    val obj = LuaOsmObject(otype = "node", id = 17, version = Some(3),
      tags = Map("name" -> "X", "amenity" -> "pub"),
      lon = 8.5, lat = 47.2)
    env.callProcess(env.callback("process_node").get, obj)
    val g = env.I.globals
    assert(g.rawGet(LStr("captured_id")) == LInt(17))
    assert(g.rawGet(LStr("captured_v")) == LInt(3))
    assert(g.rawGet(LStr("captured_name")) == LStr("X"))
    assert(g.rawGet(LStr("captured_rest")) == LNil)
    assert(g.rawGet(LStr("captured_type")) == LStr("POINT"))
    assert(g.rawGet(LStr("captured_srid")) == LInt(4326))
    assert(g.rawGet(LStr("x1")) == LNum(8.5))
    assert(g.rawGet(LStr("y2")) == LNum(47.2))
  }

  test("way object: is_closed, nodes, as_linestring/as_polygon, transform") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """function osm2pgsql.process_way(object)
        |  closed = object.is_closed
        |  nn = #object.nodes
        |  first_ref = object.nodes[1]
        |  local l = object:as_linestring()
        |  lt = l:geometry_type()
        |  llen = l:length()
        |  local m = l:transform(3857)
        |  msrid = m:srid()
        |  local p = object:as_polygon()
        |  pt = p:geometry_type()
        |  local pm = object:as_point(-1)
        |  pmx = ({pm:get_bbox()})[1]
        |end
        |""".stripMargin)
    val obj = LuaOsmObject(otype = "way", id = 5,
      tags = Map("highway" -> "residential"),
      nodeRefs = Seq(1L, 2L, 3L, 1L),
      lons = Seq(0.0, 1.0, 1.0, 0.0), lats = Seq(0.0, 0.0, 1.0, 0.0))
    env.callProcess(env.callback("process_way").get, obj)
    val g = env.I.globals
    assert(g.rawGet(LStr("closed")) == LBool(true))
    assert(g.rawGet(LStr("nn")) == LInt(4))
    assert(g.rawGet(LStr("first_ref")) == LInt(1))
    assert(g.rawGet(LStr("lt")) == LStr("LINESTRING"))
    assert(g.rawGet(LStr("msrid")) == LInt(3857))
    assert(g.rawGet(LStr("pt")) == LStr("POLYGON"))
    assert(g.rawGet(LStr("pmx")) == LNum(0.0))
  }

  test("relation object: members, as_multipolygon, geometries iterator") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """function osm2pgsql.process_relation(object)
        |  nm = #object.members
        |  m1t = object.members[1].type
        |  m1ref = object.members[1].ref
        |  m1role = object.members[1].role
        |  wids = osm2pgsql.way_member_ids(object)
        |  nwids = #wids
        |  local mp = object:as_multipolygon()
        |  mpt = mp:geometry_type()
        |  ngeoms = mp:num_geometries()
        |  count = 0
        |  for g in mp:geometries() do
        |    count = count + 1
        |    last_t = g:geometry_type()
        |  end
        |end
        |""".stripMargin)
    val ring1 = (Seq(0.0, 1.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0, 0.0))
    val ring2 = (Seq(5.0, 6.0, 6.0, 5.0, 5.0), Seq(5.0, 5.0, 6.0, 6.0, 5.0))
    val obj = LuaOsmObject(otype = "relation", id = 9,
      tags = Map("type" -> "multipolygon"),
      members = Seq(("w", 10L, "outer"), ("w", 11L, "outer")),
      mlons = Seq(ring1._1, ring2._1), mlats = Seq(ring1._2, ring2._2))
    env.callProcess(env.callback("process_relation").get, obj)
    val g = env.I.globals
    assert(g.rawGet(LStr("nm")) == LInt(2))
    assert(g.rawGet(LStr("m1t")) == LStr("w"))
    assert(g.rawGet(LStr("m1ref")) == LInt(10))
    assert(g.rawGet(LStr("m1role")) == LStr("outer"))
    assert(g.rawGet(LStr("nwids")) == LInt(2))
    assert(g.rawGet(LStr("mpt")) == LStr("MULTIPOLYGON"))
    assert(g.rawGet(LStr("ngeoms")) == LInt(2))
    assert(g.rawGet(LStr("count")) == LInt(2))
    assert(g.rawGet(LStr("last_t")) == LStr("POLYGON"))
  }

  test("select_relation_members returns marked way ids") {
    val env = new FlexLuaEnv()
    env.loadSource(
      """function osm2pgsql.select_relation_members(relation)
        |  if relation.tags.type == 'route' then
        |    return { ways = osm2pgsql.way_member_ids(relation) }
        |  end
        |end
        |""".stripMargin)
    val obj = LuaOsmObject(otype = "relation", id = 1,
      tags = Map("type" -> "route"),
      members = Seq(("w", 4L, ""), ("n", 7L, ""), ("w", 6L, "")))
    val (ways, nodes) = env.callSelectRelationMembers(
      env.callback("select_relation_members").get, obj)
    assert(ways == Seq(4L, 6L))
    assert(nodes.isEmpty)
    val obj2 = obj.copy(tags = Map("type" -> "multipolygon"))
    assert(env.callSelectRelationMembers(
      env.callback("select_relation_members").get, obj2) == ((Nil, Nil)))
  }

  test("insert at load time fails like the reference") {
    val env = new FlexLuaEnv()
    val e = intercept[Exception](env.loadSource(
      """local t = osm2pgsql.define_table{
        |  name = 'p', ids = {type='node', id_column='id'},
        |  columns = {{column = 'x'}}}
        |t:insert{ x = 'boom' }
        |""".stripMargin))
    assert(e.getMessage.contains("Tables not initialized yet"))
  }
}
