package graft.lua

import org.scalatest.funsuite.AnyFunSuite

/** Interpreter semantics over the Lua subset: arithmetic and
  * coercions, multiple assignment/returns, closures, metatables,
  * control flow, the stdlib subset, Lua patterns — and the gate that
  * matters: the reference's own init.lua runs and its helper
  * functions behave as the flex configs expect. */
class LuaInterpSpec extends AnyFunSuite {

  private def run(src: String): Seq[LV] = {
    val interp = new LuaInterp
    LuaStdlib.install(interp)
    interp.runSource(src)
  }
  private def one(src: String): LV = run(src).headOption.getOrElse(LNil)

  test("arithmetic: integer/float distinction") {
    assert(one("return 1 + 2") == LInt(3))
    assert(one("return 7 // 2") == LInt(3))
    assert(one("return -7 // 2") == LInt(-4)) // floor division
    assert(one("return 7 % 3") == LInt(1))
    assert(one("return -7 % 3") == LInt(2))   // Lua modulo sign
    assert(one("return 7 / 2") == LNum(3.5))  // / is always float
    assert(one("return 2 ^ 10") == LNum(1024.0))
    assert(one("return 1 + 0.5") == LNum(1.5))
    assert(one("return '10' + 5") == LInt(15)) // string coercion
    assert(one("return 2 < 10") == LBool(true))
    assert(one("return '2' < '10'") == LBool(false)) // string compare
    assert(one("return 1 == 1.0") == LBool(true))
  }

  test("strings: concat, length, tostring formats") {
    assert(one("return 'a' .. 'b' .. 1") == LStr("ab1"))
    assert(one("return #'hello'") == LInt(5))
    assert(one("return tostring(1.5)") == LStr("1.5"))
    assert(one("return tostring(3)") == LStr("3"))
    assert(one("return tostring(2.0)") == LStr("2.0"))
    assert(one("return tostring(nil)") == LStr("nil"))
  }

  test("multiple assignment and returns with adjustment") {
    assert(run("local function f() return 1, 2, 3 end return f()") ==
      Seq(LInt(1), LInt(2), LInt(3)))
    assert(run("local function f() return 1, 2 end\n" +
      "local a, b, c = f()\nreturn a, b, c") ==
      Seq(LInt(1), LInt(2), LNil))
    // mid-list calls truncate to one value; (f()) truncates too
    assert(run("local function f() return 1, 2 end\n" +
      "return f(), 10") == Seq(LInt(1), LInt(10)))
    assert(run("local function f() return 1, 2 end\n" +
      "return (f())") == Seq(LInt(1)))
  }

  test("closures capture by reference (upvalues)") {
    assert(one(
      """local function counter()
        |  local n = 0
        |  return function() n = n + 1 return n end
        |end
        |local c = counter()
        |c() c()
        |return c()""".stripMargin) == LInt(3))
  }

  test("tables: constructors, length, nested, last-call expansion") {
    assert(one("local t = {1, 2, 3} return #t") == LInt(3))
    assert(one("local t = {a = 1, b = 2} return t.a + t.b") == LInt(3))
    assert(one("local t = {[2 + 2] = 'x'} return t[4]") == LStr("x"))
    assert(one("local function f() return 2, 3 end\n" +
      "local t = {1, f()} return #t") == LInt(3))
    assert(one("local t = {} t[1] = 'a' t.k = 'b' return t[1] .. t.k")
      == LStr("ab"))
  }

  test("control flow: if/while/repeat/for/break") {
    assert(one(
      """local s = 0
        |for i = 1, 10 do s = s + i end
        |return s""".stripMargin) == LInt(55))
    assert(one(
      """local s = 0
        |for i = 10, 1, -2 do s = s + i end
        |return s""".stripMargin) == LInt(30))
    assert(one(
      """local s = 0
        |local i = 0
        |while true do i = i + 1 if i > 3 then break end s = s + i end
        |return s""".stripMargin) == LInt(6))
    assert(one(
      """local i = 0
        |repeat i = i + 1 until i >= 5
        |return i""".stripMargin) == LInt(5))
  }

  test("generic for over pairs and ipairs") {
    assert(one(
      """local t = {10, 20, 30}
        |local s = 0
        |for i, v in ipairs(t) do s = s + i * v end
        |return s""".stripMargin) == LInt(10 + 40 + 90))
    assert(one(
      """local t = {a = 1, b = 2, c = 3}
        |local s = 0
        |for k, v in pairs(t) do s = s + v end
        |return s""".stripMargin) == LInt(6))
  }

  test("metatables: __index chains, functions, __call, __tostring") {
    assert(one(
      """local base = {greet = 'hi'}
        |local t = setmetatable({}, {__index = base})
        |return t.greet""".stripMargin) == LStr("hi"))
    assert(one(
      """local t = setmetatable({}, {__index = function(_, k)
        |  return k .. '!' end})
        |return t.x""".stripMargin) == LStr("x!"))
    assert(one(
      """local t = setmetatable({}, {__call = function(self, x)
        |  return x * 2 end})
        |return t(21)""".stripMargin) == LInt(42))
    assert(one(
      """local t = setmetatable({}, {__tostring = function()
        |  return 'custom' end})
        |return tostring(t)""".stripMargin) == LStr("custom"))
  }

  test("error/pcall semantics with positions") {
    assert(run("return pcall(function() error('boom') end)") ==
      Seq(LBool(false), LStr("boom")))
    assert(run("return pcall(function() return 1 + nil end)").head ==
      LBool(false))
    val caught = run(
      "local ok, e = pcall(function() local x = nil return x.y end)\n" +
        "return ok, e")
    assert(caught.head == LBool(false))
    assert(caught(1).asInstanceOf[LStr].s.contains("attempt to index"))
  }

  test("stdlib: string functions incl. Lua patterns") {
    assert(one("return string.sub('hello', 2, 4)") == LStr("ell"))
    assert(one("return ('hello'):sub(-3)") == LStr("llo"))
    assert(one("return ('x'):rep(3, '-')") == LStr("x-x-x"))
    assert(one("return string.format('%d|%s|%.2f', 7, 'a', 1.5)") ==
      LStr("7|a|1.50"))
    assert(one("return string.match('DE', '^%u%u$')") == LStr("DE"))
    assert(one("return string.match('de', '^%u%u$')") == LNil)
    assert(one("return string.match('abc 123', '(%a+) (%d+)')") ==
      LStr("abc"))
    assert(run("return string.match('55 mph', '^(-?[0-9.]+) ?(%a*)$')")
      == Seq(LStr("55"), LStr("mph")))
    assert(one("return select('#', 'a', 'b', 'c')") == LInt(3))
    assert(one(
      """local out = {}
        |for w in string.gmatch('a;b;c', '([^;]+)') do
        |  out[#out + 1] = w
        |end
        |return table.concat(out, '-')""".stripMargin) == LStr("a-b-c"))
    assert(one("return (string.gsub('hello world', 'o', '0'))") ==
      LStr("hell0 w0rld"))
    assert(one("return string.find('abc', 'b')") == LInt(2))
  }

  test("stdlib: table functions") {
    assert(one(
      """local t = {3, 1, 2}
        |table.sort(t)
        |return table.concat(t, ',')""".stripMargin) == LStr("1,2,3"))
    assert(one(
      """local t = {'b', 'c'}
        |table.insert(t, 'd')
        |table.insert(t, 1, 'a')
        |return table.concat(t)""".stripMargin) == LStr("abcd"))
    assert(one(
      """local t = {1, 2, 3}
        |table.sort(t, function(a, b) return a > b end)
        |return table.concat(t)""".stripMargin) == LStr("321"))
  }

  test("stdlib: math and os.date") {
    assert(one("return math.floor(3.7)") == LInt(3))
    assert(one("return math.min(3, 1, 2)") == LInt(1))
    assert(one("return math.max(3, 1, 2)") == LInt(3))
    assert(one("return math.sqrt(16)") == LNum(4.0))
    // attributes.lua's format_date shape over a fixed epoch
    assert(one("return os.date('!%Y-%m-%dT%H:%M:%SZ', 0)") ==
      LStr("1970-01-01T00:00:00Z"))
    assert(one("return os.date('!%Y-%m-%dT%H:%M:%SZ', 1700000000)") ==
      LStr("2023-11-14T22:13:20Z"))
  }

  test("the reference's init.lua runs and its helpers work") {
    val interp = new LuaInterp("init.lua")
    LuaStdlib.install(interp)
    // the host installs the osm2pgsql namespace before init.lua runs,
    // including the OSMObject/Geometry method tables init.lua extends
    // (src/lua-init.cpp registers them before executing the chunk)
    val osm2pgsql = new LTable
    interp.globals.rawSet(LStr("osm2pgsql"), osm2pgsql)
    val geometry = new LTable
    osm2pgsql.rawSet(LStr("Geometry"), geometry)
    val osmObject = new LTable
    val osmObjectIndex = new LTable
    osmObject.rawSet(LStr("__index"), osmObjectIndex)
    osm2pgsql.rawSet(LStr("OSMObject"), osmObject)
    val defined = scala.collection.mutable.ArrayBuffer.empty[LV]
    osm2pgsql.rawSet(LStr("define_table"),
      LBuiltin("define_table", { args =>
        defined += args.headOption.getOrElse(LNil)
        Seq(args.headOption.getOrElse(LNil))
      }))
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/src/init.lua")),
      java.nio.charset.StandardCharsets.UTF_8)
    interp.run(LuaParser.parse(src, "init.lua"))

    def call1(path: Seq[String], args: LV*): LV = {
      val f = path.foldLeft[LV](interp.globals)((o, k) =>
        interp.index(o, LStr(k), 0))
      interp.call(f, args).headOption.getOrElse(LNil)
    }
    // has_prefix / has_suffix
    assert(call1(Seq("osm2pgsql", "has_prefix"),
      LStr("tiger:cnty"), LStr("tiger:")) == LBool(true))
    assert(call1(Seq("osm2pgsql", "has_suffix"),
      LStr("a:note"), LStr(":note")) == LBool(true))
    assert(call1(Seq("osm2pgsql", "has_prefix"),
      LNil, LStr("x")) == LNil)
    // trim (uses Lua patterns with a position capture)
    assert(call1(Seq("osm2pgsql", "trim"),
      LStr("  hi there \t")) == LStr("hi there"))
    assert(call1(Seq("osm2pgsql", "trim"), LStr("   ")) == LStr(""))
    // clamp
    assert(call1(Seq("osm2pgsql", "clamp"),
      LInt(15), LInt(1), LInt(10)) == LInt(10))
    // split_string (gmatch + trim)
    val parts = call1(Seq("osm2pgsql", "split_string"),
      LStr("a; b ;c")).asInstanceOf[LTable]
    assert((1L to parts.length).map(i => parts.rawGet(LInt(i))) ==
      Seq(LStr("a"), LStr("b"), LStr("c")))
    // split_unit (string.match with two captures)
    val interp2 = interp
    val su = interp2.call(interp.index(osm2pgsql, LStr("split_unit"), 0),
      Seq(LStr("55 mph"), LStr("km/h")))
    assert(su == Seq(LInt(55), LStr("mph")))
    val su2 = interp2.call(interp.index(osm2pgsql, LStr("split_unit"), 0),
      Seq(LStr("10"), LStr("km/h")))
    assert(su2 == Seq(LInt(10), LStr("km/h")))
    // make_clean_tags_func end to end (closures over prefix lists)
    val cleaner = interp.call(
      interp.index(osm2pgsql, LStr("make_clean_tags_func"), 0),
      Seq(LTable.fromSeq(Seq(LStr("created_by"), LStr("source:*"),
        LStr("*:note"))))).head
    val tags = LTable.of(
      LStr("created_by") -> LStr("x"),
      LStr("source:ref") -> LStr("y"),
      LStr("a:note") -> LStr("z"),
      LStr("name") -> LStr("keep"))
    val emptied = interp.call(cleaner, Seq(tags)).head
    assert(emptied == LBool(false))
    assert(tags.rawGet(LStr("name")) == LStr("keep"))
    assert(tags.rawGet(LStr("created_by")) == LNil)
    assert(tags.rawGet(LStr("source:ref")) == LNil)
    assert(tags.rawGet(LStr("a:note")) == LNil)
    // make_check_values_func with default (metatable __index fn)
    val chk = interp.call(
      interp.index(osm2pgsql, LStr("make_check_values_func"), 0),
      Seq(LTable.fromSeq(Seq(LStr("yes"), LStr("no"))),
        LStr("other"))).head
    assert(interp.call(chk, Seq(LStr("yes"))).head == LStr("yes"))
    assert(interp.call(chk, Seq(LStr("banana"))).head == LStr("other"))
    // define_node_table delegates to define_table with built ids
    val res = interp.call(
      interp.index(osm2pgsql, LStr("define_node_table"), 0),
      Seq(LStr("pois"), LTable.fromSeq(Nil))).head.asInstanceOf[LTable]
    assert(res.rawGet(LStr("name")) == LStr("pois"))
    val ids = res.rawGet(LStr("ids")).asInstanceOf[LTable]
    assert(ids.rawGet(LStr("type")) == LStr("node"))
    assert(ids.rawGet(LStr("id_column")) == LStr("node_id"))
    assert(defined.size == 1)
    // init.lua added grab_tag to the OSMObject method table
    val grab = osmObjectIndex.rawGet(LStr("grab_tag"))
    assert(grab != LNil)
    val data = LTable.of(LStr("tags") ->
      LTable.of(LStr("highway") -> LStr("primary")))
    assert(interp.call(grab, Seq(data, LStr("highway"))).head ==
      LStr("primary"))
    assert(data.rawGet(LStr("tags")).asInstanceOf[LTable]
      .rawGet(LStr("highway")) == LNil) // grabbed = removed
    // and geometries() returns a closure-based iterator
    assert(geometry.rawGet(LStr("geometries")) != LNil)
  }
}
