package graft.lua

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.flex.{Enrich, FlexRunner, LuaFlexConfig}
import graft.sources.OsmText

/** BDD scenarios that exercise the Lua API itself, executed with
  * their VERBATIM feature Lua snippets through the runtime:
  * lua-basics.feature (osm2pgsql globals + properties),
  * lua-callbacks.feature (dispatch counts over Liechtenstein),
  * tags.feature (unicode and control characters through
  * text/hstore/json/jsonb columns). */
class LuaBddSpec extends SparkSpecBase {

  import spark.implicits._

  test("lua-basics: osm2pgsql globals; no-tables config fails") {
    val out = new java.io.ByteArrayOutputStream()
    val cfg = Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      val c = new LuaFlexConfig(
        """print("version=" .. osm2pgsql.version)
          |print("mode=" .. osm2pgsql.mode)
          |print("stage=" .. osm2pgsql.stage)
          |print("Table=" .. type(osm2pgsql.Table))
          |""".stripMargin)
      c.tables // force the load
      c
    }
    val printed = out.toString("UTF-8")
    assert(printed.contains("mode=create"))
    assert(printed.contains("stage=1"))
    assert(printed.contains("Table=table"))
    // no tables is a WARNING (stderr), not an error — the run
    // proceeds with zero output tables (output-flex.cpp:1361)
    val osm = Enrich.forFlex(OsmText.toFrames(spark, ""), "create")
    assert(FlexRunner.run(cfg, osm).tables.isEmpty)
  }

  test("lua-basics: osm2pgsql.properties carries import settings") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      new LuaFlexConfig(
        """local p = osm2pgsql.properties
          |print("attributes=" .. p.attributes)
          |print("prefix=" .. p.prefix)
          |""".stripMargin,
        properties = Map("attributes" -> "false",
          "prefix" -> "planet_osm")).tables
    }
    val printed = out.toString("UTF-8")
    assert(printed.contains("attributes=false"))
    assert(printed.contains("prefix=planet_osm"))
  }

  test("lua-callbacks: dispatch counts over Liechtenstein " +
      "(1562 nodes / 7105 ways / 113 relations)") {
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    assume(new java.io.File(pbf).exists())
    // the feature counts callback invocations; distributed analog:
    // one id-only insert per dispatch (the feature's dummy table is
    // id-only — that shape must be definable)
    val cfg = new LuaFlexConfig(
      """local dummy = osm2pgsql.define_node_table('dummy', {})
        |local calls = osm2pgsql.define_table{
        |  name = 'calls',
        |  ids = { type = 'any', id_column = 'osm_id' },
        |  columns = {{ column = 'kind', type = 'text' }}}
        |function osm2pgsql.process_node(object)
        |  calls:insert{ kind = 'n' }
        |end
        |function osm2pgsql.process_way(object)
        |  calls:insert{ kind = 'w' }
        |end
        |function osm2pgsql.process_relation(object)
        |  calls:insert{ kind = 'r' }
        |end
        |""".stripMargin)
    val osm = Enrich.forFlex(graft.sources.OsmPbf.read(spark, pbf),
      "create")
    val r = FlexRunner.run(cfg, osm)
    val counts = r.tables("calls").rows.groupBy("kind").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("n" -> 1562L, "w" -> 7105L, "r" -> 113L))
  }

  test("callback errors wrap in the reference's failure text") {
    val cfg = new LuaFlexConfig(
      """osm2pgsql.define_node_table('t', {{ column = 'v' }})
        |function osm2pgsql.process_node(object)
        |  error('boom')
        |end
        |""".stripMargin)
    val osm = Enrich.forFlex(OsmText.toFrames(spark,
      "n1 v1 dV Ta=b x1 y1"), "create")
    val e = intercept[Exception](
      FlexRunner.run(cfg, osm).tables("t").rows.count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains(
      "Failed to execute Lua function 'osm2pgsql.process_node'")))
  }

  test("tags: unicode names through text/hstore/json/jsonb columns") {
    val names = Seq("Paris", "Nürnberg", "Plzeň", "Αθήνα",
      "תל־אביב-יפו", "عَمَّان", "北京", "ရန်ကုန်", "मुंबई")
    val osmText = names.zipWithIndex.map { case (n, i) =>
      s"n${10 + i} v1 dV Tname=$n x10.0 y10.0"
    }.mkString("\n")
    val cfg = new LuaFlexConfig(
      """local pois = osm2pgsql.define_node_table('osm2pgsql_test_pois', {
        |  { column = 'name', type = 'text' },
        |  { column = 'htags', type = 'hstore' },
        |  { column = 'jtags', type = 'json' },
        |  { column = 'btags', type = 'jsonb' },
        |})
        |function osm2pgsql.process_node(object)
        |  pois:insert{
        |    name = object.tags.name,
        |    htags = object.tags,
        |    jtags = object.tags,
        |    btags = object.tags
        |  }
        |end
        |""".stripMargin)
    val osm = Enrich.forFlex(OsmText.toFrames(spark, osmText), "create")
    val r = FlexRunner.run(cfg, osm)
    val rows = r.tables("osm2pgsql_test_pois").rows
      .select($"node_id", $"name", element_at($"htags", "name"),
        get_json_object($"jtags", "$.name"),
        get_json_object($"btags", "$.name"))
      .as[(Long, String, String, String, String)].collect().sortBy(_._1)
    assert(rows.length == names.size)
    rows.zip(names).foreach { case ((_, t, h, j, b), n) =>
      assert(t == n); assert(h == n); assert(j == n); assert(b == n)
    }
  }

  test("tags: control characters survive the tag pipeline") {
    // the feature's %-escapes: space, tab, ESC+LF, SOH+US
    val vals = Seq("", " ", "\t", "\n", "")
    val osmText = "" // built below via frames directly (OsmText's
    // escaping differs; construct the frames from rows)
    val nodes = vals.zipWithIndex.map { case (v, i) =>
      graft.model.OsmNode(id = 10 + i, lon = 10.0, lat = 10.0,
        tags = if (v.isEmpty) Map("name" -> "") else Map("name" -> v))
    }
    val osm0 = graft.sources.OsmXml.OsmDataFrames(
      nodes.toDF().withColumn("action", lit("create")),
      spark.emptyDataset[graft.model.OsmWay].toDF()
        .withColumn("action", lit("create")),
      spark.emptyDataset[graft.model.OsmRelation].toDF()
        .withColumn("action", lit("create")))
    val cfg = new LuaFlexConfig(
      """local pois = osm2pgsql.define_node_table('pois', {
        |  { column = 'name', type = 'text' },
        |  { column = 'htags', type = 'hstore' },
        |  { column = 'btags', type = 'jsonb' },
        |})
        |function osm2pgsql.process_node(object)
        |  pois:insert{ name = object.tags.name, htags = object.tags,
        |               btags = object.tags }
        |end
        |""".stripMargin)
    val r = FlexRunner.run(cfg, Enrich.forFlex(osm0, "create"))
    val rows = r.tables("pois").rows
      .select($"node_id", $"name", element_at($"htags", "name"),
        get_json_object($"btags", "$.name"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    rows.zip(vals).foreach { case ((_, t, h, b), v) =>
      assert(t == v); assert(h == v); assert(b == v)
    }
  }
}
