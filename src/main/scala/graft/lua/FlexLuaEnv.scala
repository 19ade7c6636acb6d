package graft.lua

import scala.collection.mutable

import graft.flex._
import graft.geom._

/** One OSM object's data as the Lua callbacks see it — the carrier
  * between a DataFrame row and `push_osm_object_to_lua_stack`
  * (reference: src/output-flex.cpp:121-195). Coordinate fields are
  * the CLI's enrichment columns (`__lons`/`__lats` resolved way
  * coords, `__mlons`/`__mlats` member-way coords, `__mnlons`/
  * `__mnlats` member-node coords); null when not applicable or not
  * resolvable. */
final case class LuaOsmObject(
    otype: String, // "node" | "way" | "relation"
    id: Long,
    version: Option[Long] = None,
    timestamp: Option[Long] = None,
    changeset: Option[Long] = None,
    uid: Option[Long] = None,
    user: Option[String] = None,
    /** deleted objects push attributes only — no tags/nodes/members
      * (push_osm_object_to_lua_stack's !deleted guard) */
    deleted: Boolean = false,
    tags: Map[String, String] = Map.empty,
    lon: Double = Double.NaN,
    lat: Double = Double.NaN,
    nodeRefs: Seq[Long] = Nil,
    lons: Seq[Double] = null,
    lats: Seq[Double] = null,
    members: Seq[(String, Long, String)] = Nil,
    mlons: Seq[Seq[Double]] = null,
    mlats: Seq[Seq[Double]] = null,
    mnlons: Seq[Double] = null,
    mnlats: Seq[Double] = null)

/** One collected insert: table index plus the converted column
  * values, partitioned by Spark-side carrier type (strings for
  * scalar columns, EWKB bytes for geometry, string maps for hstore).
  * `otype`/`oid` let the per-table projection compute the id columns
  * exactly like `flex_table_t::map_id`. */
final case class LuaInsert(
    tbl: Int,
    strs: Map[String, String],
    bins: Map[String, Array[Byte]],
    maps: Map[String, Map[String, String]],
    otype: String,
    oid: Long)

/** The `osm2pgsql` Lua environment of the flex output — the analog of
  * `output_flex_t::init_lua` (reference: src/output-flex.cpp:
  * 1403-1506) + `setup_lua_environment` (src/lua-setup.cpp:18-39):
  * the global `osm2pgsql` table with `define_table` /
  * `define_expire_output`, the `Table` / `ExpireOutput` / `Geometry` /
  * `OSMObject` classes, the version/mode/stage/properties fields, and
  * the init.lua helper layer (src/init.lua — re-expressed, same
  * contracts).
  *
  * One env per Lua state. The driver builds one to LOAD the config
  * (collect table defs, detect callbacks); each executor partition
  * builds its own to RUN the callbacks — the same
  * one-Lua-state-per-thread model the reference uses, minus its
  * global mutex (states share nothing here).
  */
final class FlexLuaEnv(
    val chunkName: String = "config.lua",
    mode: String = "create",
    stage: Int = 1,
    properties: Map[String, String] = Map.empty,
    configDir: String = "") {

  val I = new LuaInterp(chunkName)
  LuaStdlib.install(I)

  val osm2pgsql = new LTable
  I.globals.rawSet(LStr("osm2pgsql"), osm2pgsql)

  val tableDefs = mutable.ArrayBuffer.empty[FlexTableDef]
  val expireOutputs = mutable.ArrayBuffer.empty[FlexExpireOutput]
  val genSteps = mutable.ArrayBuffer.empty[FlexGenStep]
  /** expire refs per (tableIdx, columnName), resolved after load */
  val expireRefs = mutable.ArrayBuffer.empty[FlexLuaEnv.ExpireRef]

  /** Installed by the runner before processing; at load time insert
    * fails like the reference (src/output-flex.cpp:780-782). */
  var insertSink: (Int, LTable) => Seq[LV] = (_, _) =>
    throw new IllegalStateException("Tables not initialized yet. Insert " +
      "can only be called from processing functions.")
  var inIdCacheSink: (Int, Seq[Long]) => Seq[Long] = (_, _) => Nil

  /** calling context: "main" | "node" | "way" | "relation" |
    * "select_relation_members" (src/output-flex.cpp calling_context) */
  var callingContext: String = "main"
  var currentObject: LuaOsmObject = null

  private def err(msg: String): Nothing = I.fail(0, msg)

  private def fnv(name: String)(f: Seq[LV] => Seq[LV]): LBuiltin =
    LBuiltin(name, f)

  private def optStr(t: LTable, k: String): Option[String] =
    t.rawGet(LStr(k)) match {
      case LNil    => None
      case LStr(s) => Some(s)
      case v       => Some(I.tostring(v))
    }
  private def optInt(t: LTable, k: String): Option[Long] =
    t.rawGet(LStr(k)) match {
      case LNil => None
      case v    => I.toInteger(v)
    }
  /** luaX_get_table_bool (src/lua-utils.cpp:176-194): nil → false,
    * exact reference wording otherwise. */
  private def optBool(t: LTable, k: String, what: String): Boolean =
    t.rawGet(LStr(k)) match {
      case LNil     => false
      case LBool(b) => b
      case _        => err(s"$what field '$k' must be a boolean field.")
    }
  /** luaX_get_table_string with default (src/lua-utils.cpp:157-174):
    * nil → default; numbers pass (lua_isstring coerces them). */
  private def defStr(t: LTable, k: String, what: String,
      default: String): String =
    t.rawGet(LStr(k)) match {
      case LNil    => default
      case LStr(s) => s
      case LInt(n) => n.toString
      case n: LNum => I.tostring(n)
      case _ => err(s"$what field must contain a '$k' string field " +
        s"(or nil for default: '$default').")
    }
  /** luaX_get_table_optional_uint32/64 (src/lua-utils.cpp:196-243):
    * nil → 0, range-checked otherwise (strings that read as numbers
    * pass, like lua_isnumber). */
  private def optUint(t: LTable, k: String, what: String,
      min: Long, max: Long, range: String): Long =
    t.rawGet(LStr(k)) match {
      case LNil => 0L
      case v =>
        val num = v match {
          case LInt(n) => Some(n.toDouble)
          case LNum(d) => Some(d)
          case LStr(s) => s.toDoubleOption
          case _       => None
        }
        num match {
          case None => err(s"$what must contain an integer.")
          case Some(d) if d < min || d > max =>
            err(s"$what must be between $range.")
          case Some(d) => d.toLong
        }
    }
  private def arrayOf(t: LTable): Seq[LV] =
    (1L to t.length).map(i => t.rawGet(LInt(i)))

  // ---------- Geometry class ----------

  val geomMeta: LTable = LuaGeom.install(I, osm2pgsql)
  def wrapGeom(g: Geometry): LUserdata = new LUserdata(g, Some(geomMeta))

  // ---------- ExpireOutput class ----------

  private val expireMeta = new LTable
  expireMeta.rawSet(LStr("__index"), expireMeta)
  private def expireOutputOf(v: LV): (Int, FlexExpireOutput) = v match {
    case u: LUserdata => u.value match {
      case i: java.lang.Integer => (i.intValue, expireOutputs(i.intValue))
      case _ => err("Expire output must be of type ExpireOutput.")
    }
    case _ => err("Expire output must be of type ExpireOutput.")
  }
  private def expireFn(name: String)(f: FlexExpireOutput => LV): Unit =
    expireMeta.rawSet(LStr(name), fnv(name) { a =>
      Seq(f(expireOutputOf(a.headOption.getOrElse(LNil))._2))
    })
  expireFn("filename")(e => e.filename.map(LStr).getOrElse(LStr("")))
  expireFn("maxzoom")(e => LInt(e.maxzoom.toLong))
  expireFn("minzoom")(e => LInt(e.minzoom.toLong))
  expireFn("schema")(e => LStr(e.schema))
  expireFn("table")(e => e.table.map(LStr).getOrElse(LStr("")))
  expireFn("max_tiles_geometry")(e => LInt(e.maxTilesPerGeometry))
  expireFn("max_tiles_overall")(e => LInt(e.maxTilesOverall))
  expireMeta.rawSet(LStr("__tostring"), fnv("__tostring") { a =>
    val (i, _) = expireOutputOf(a.headOption.getOrElse(LNil))
    Seq(LStr(s"osm2pgsql.ExpireOutput[$i]"))
  })
  osm2pgsql.rawSet(LStr("ExpireOutput"), expireMeta)

  // ---------- Table class ----------

  private val tableMeta = new LTable
  tableMeta.rawSet(LStr("__index"), tableMeta)
  private def tableIdxOf(v: LV): Int = v match {
    case u: LUserdata => u.value match {
      case i: java.lang.Integer => i.intValue
      case _ => err("First parameter must be of type osm2pgsql.Table.")
    }
    case _ => err("First parameter must be of type osm2pgsql.Table.")
  }
  tableMeta.rawSet(LStr("insert"), fnv("insert") { a =>
    if (a.size != 2)
      err("Need two parameters: The osm2pgsql.Table and the row data.")
    val idx = tableIdxOf(a.head)
    a(1) match {
      case row: LTable => insertSink(idx, row)
      case _ => err("Second parameter must be a Lua table with the row data.")
    }
  })
  tableMeta.rawSet(LStr("in_id_cache"), fnv("in_id_cache") { a =>
    // (src/output-flex.cpp:846-884): second param is an id array;
    // result is the array of 1-based INDEXES that hit the cache
    if (callingContext == "node")
      err("Id cache not available while processing nodes.")
    val idx = tableIdxOf(a.headOption.getOrElse(LNil))
    if (!tableDefs(idx).idCache)
      err(s"No ID cache on table '${tableDefs(idx).name}'.")
    val ids = a.lift(1) match {
      case Some(t: LTable) => arrayOf(t).flatMap(I.toInteger)
      case _ => err("Second parameter must be an array of ids.")
    }
    val hits = inIdCacheSink(idx, ids)
    Seq(LTable.fromSeq(hits.map(LInt)))
  })
  tableMeta.rawSet(LStr("name"), fnv("name") { a =>
    Seq(LStr(tableDefs(tableIdxOf(a.headOption.getOrElse(LNil))).name))
  })
  tableMeta.rawSet(LStr("schema"), fnv("schema") { a =>
    Seq(LStr(tableDefs(tableIdxOf(a.headOption.getOrElse(LNil)))
      .schemaName.getOrElse("public")))
  })
  tableMeta.rawSet(LStr("cluster"), fnv("cluster") { a =>
    Seq(LBool(tableDefs(tableIdxOf(a.headOption.getOrElse(LNil))).cluster))
  })
  tableMeta.rawSet(LStr("columns"), fnv("columns") { a =>
    val t = tableDefs(tableIdxOf(a.headOption.getOrElse(LNil)))
    Seq(LTable.fromSeq(t.columns.map { c =>
      LTable.of(
        LStr("name") -> LStr(c.name),
        LStr("type") -> LStr(c.ctype.toString.toLowerCase),
        LStr("sql_type") -> LStr(c.sqlTypeOverride.getOrElse("")),
        LStr("sql_modifiers") -> LStr(if (c.notNull) "NOT NULL" else ""),
        LStr("not_null") -> LBool(c.notNull),
        LStr("create_only") -> LBool(c.createOnly))
    }))
  })
  tableMeta.rawSet(LStr("__tostring"), fnv("__tostring") { a =>
    Seq(LStr(
      s"osm2pgsql.Table[${tableDefs(tableIdxOf(a.headOption.getOrElse(LNil))).name}]"))
  })
  osm2pgsql.rawSet(LStr("Table"), tableMeta)

  // ---------- Locator class (define_locator) ----------

  /** add_from_db resolver: user SQL → (name, geometry) regions. The
    * CLI wires a live-PG resolver when `-d` is given; executor envs
    * get a broadcast-backed lookup of the driver's results. Default
    * matches the reference's no-connection failure. */
  var dbRegions: String => Seq[(String, Geometry)] = sql =>
    throw new IllegalStateException(
      "Database connection failed: add_from_db needs a database (-d).")

  /** name + mutable region list per locator; the Locator operator
    * builds lazily on first query */
  final class LocatorState(val name: String) {
    val regions = mutable.ArrayBuffer.empty[graft.operators.Region]
    private var built: graft.operators.Locator = null
    private var builtAt = -1
    def locator: graft.operators.Locator = {
      if (built == null || builtAt != regions.size) {
        built = graft.operators.Locator.fromRegions(regions.toSeq)
        builtAt = regions.size
      }
      built
    }
  }
  val locators = mutable.ArrayBuffer.empty[LocatorState]

  private val locatorMeta = new LTable
  locatorMeta.rawSet(LStr("__index"), locatorMeta)
  // wrapper argument check (lua_wrapper_base_t, output-flex.cpp:232)
  private def locatorOf(v: LV): LocatorState = v match {
    case u: LUserdata => u.value match {
      case s: LocatorState => s
      case _ => err("Argument #1 has to be of type osm2pgsql.Locator.")
    }
    case _ => err("Argument #1 has to be of type osm2pgsql.Locator.")
  }
  private def locatorGeomArg(a: Seq[LV], fname: String): Geometry =
    a.lift(1) match {
      case Some(u: LUserdata) => u.value match {
        case g: Geometry => g
        case _ => err(s"Error in '$fname': Need locator and geometry " +
          "arguments")
      }
      case _ => err(s"Error in '$fname': Need locator and geometry " +
        "arguments")
    }
  locatorMeta.rawSet(LStr("name"), fnv("name") { a =>
    Seq(LStr(locatorOf(a.headOption.getOrElse(LNil)).name))
  })
  locatorMeta.rawSet(LStr("__tostring"), fnv("__tostring") { a =>
    val s = locatorOf(a.headOption.getOrElse(LNil))
    Seq(LStr(s"osm2pgsql.Locator[name=${s.name},size=${s.regions.size}]"))
  })
  locatorMeta.rawSet(LStr("add_bbox"), fnv("add_bbox") { a =>
    // add_bbox(name, min_x, min_y, max_x, max_y)
    // (src/flex-lua-locator.cpp:95-108)
    val s = locatorOf(a.headOption.getOrElse(LNil))
    val rname = a.lift(1) match {
      case Some(LStr(n)) => n
      case _ => err("Error in 'add_bbox': Need locator, name and 4 " +
        "coordinates as arguments")
    }
    val nums = (2 to 5).map(i => a.lift(i).flatMap(I.coerceNum)
      .map(I.asDouble).getOrElse(err(
        "Error in 'add_bbox': Need locator, name and 4 coordinates " +
          "as arguments")))
    // bbox region: box-only Region with INCLUSIVE edge semantics
    // (a point on a shared corner matches both boxes)
    s.regions += graft.operators.Region(rname, NullGeom(),
      Box(nums(0), nums(1), nums(2), nums(3)))
    Nil
  })
  locatorMeta.rawSet(LStr("add_from_db"), fnv("add_from_db") { a =>
    val s = locatorOf(a.headOption.getOrElse(LNil))
    val sql = a.lift(1) match {
      case Some(LStr(q)) => q
      case _ =>
        err("Error in 'add_from_db': Need locator and SQL query arguments")
    }
    s.regions ++= dbRegions(sql).map { case (n, g) =>
      graft.operators.Region(n, g,
        Box.of(g).getOrElse(Box(0, 0, 0, 0)))
    }
    Nil
  })
  locatorMeta.rawSet(LStr("all_intersecting"), fnv("all_intersecting") { a =>
    val s = locatorOf(a.headOption.getOrElse(LNil))
    val g = locatorGeomArg(a, "all_intersecting")
    Seq(LTable.fromSeq(s.locator.intersectingGeom(g).map(LStr)))
  })
  locatorMeta.rawSet(LStr("first_intersecting"),
    fnv("first_intersecting") { a =>
      val s = locatorOf(a.headOption.getOrElse(LNil))
      val g = locatorGeomArg(a, "first_intersecting")
      s.locator.intersectingGeom(g).headOption match {
        case Some(n) => Seq(LStr(n))
        case None    => Seq(LNil)
      }
    })
  osm2pgsql.rawSet(LStr("Locator"), locatorMeta)

  osm2pgsql.rawSet(LStr("define_locator"), fnv("define_locator") { a =>
    val t = a.headOption match {
      case Some(t: LTable) => t
      case _ => err("Argument #1 to 'define_locator' must be a Lua table.")
    }
    // name is OPTIONAL (locator.feature: 'without name is okay')
    val s = new LocatorState(optStr(t, "name").getOrElse(""))
    locators += s
    Seq(new LUserdata(s, Some(locatorMeta)))
  })

  // ---------- define_expire_output ----------

  osm2pgsql.rawSet(LStr("define_expire_output"), fnv("define_expire_output") {
    a =>
      val t = a.headOption match {
        case Some(t: LTable) => t
        case _ =>
          err("Argument #1 to 'define_expire_output' must be a Lua table.")
      }
      // create_expire_output (src/flex-lua-expire-output.cpp:22-86):
      // exact field order and wording; maxzoom is OPTIONAL — nil means
      // 0 (whole-world tile, lua-expire.feature "without maxzoom")
      val filename = defStr(t, "filename", "The expire output", "")
      val schema = defStr(t, "schema", "The expire output", "public")
      val tableN = defStr(t, "table", "The expire output", "")
      if (filename.isEmpty && tableN.isEmpty)
        err("Must set 'filename' and/or 'table' on expire output.")
      val maxzoom = optUint(t, "maxzoom",
        "The 'maxzoom' field in a expire output", 1, 20, "1 and 20")
      val minzoom = optUint(t, "minzoom",
        "The 'minzoom' field in a expire output", 1, maxzoom,
        "1 and 'maxzoom'")
      val mtg = optUint(t, "max_tiles_geometry",
        "The 'max_tiles_geometry' field in a expire output", 1, 4L << 20,
        "1 and 4 << 20")
      val mto = optUint(t, "max_tiles_overall",
        "The 'max_tiles_overall' field in a expire output", 1, 4L << 20,
        "1 and 4 << 20")
      val eo =
        try FlexExpireOutput(
          name = s"expire_output_${expireOutputs.size}",
          filename = Some(filename).filter(_.nonEmpty),
          table = Some(tableN).filter(_.nonEmpty),
          schema = schema,
          maxzoom = maxzoom.toInt,
          minzoomOpt = Some(minzoom.toInt).filter(_ > 0),
          maxTilesGeometryOpt = Some(mtg).filter(_ > 0),
          maxTilesOverallOpt = Some(mto).filter(_ > 0))
        catch {
          case e: IllegalArgumentException =>
            err(Option(e.getMessage).getOrElse("")
              .stripPrefix("requirement failed: "))
        }
      expireOutputs += eo
      Seq(new LUserdata(Integer.valueOf(expireOutputs.size - 1),
        Some(expireMeta)))
  })

  // ---------- define_table ----------

  private def parseProjection(v: LV): Int = v match {
    // set_projection (src/flex-table-column.cpp:105-130)
    case LStr(s) => s.toLowerCase match {
      case "merc" | "mercator"            => Srid.WebMercator
      case "latlong" | "latlon" | "wgs84" => Srid.WGS84
      case other => other.toIntOption.getOrElse(
        err(s"Unknown projection: $other"))
    }
    case v2 => I.toInteger(v2).map(_.toInt).getOrElse(
      err("Unknown projection."))
  }

  private def parseExpireField(v: LV, isGeom: Boolean, srid: Int,
      tableIdx: Int, colName: String): Unit = {
    // parse_and_set_expire_options (src/flex-lua-table.cpp:222-327)
    if (v == LNil) return
    if (!isGeom || srid != Srid.WebMercator)
      err("Expire only allowed for geometry columns in Web Mercator projection.")
    v match {
      case _: LUserdata =>
        expireRefs += FlexLuaEnv.ExpireRef(tableIdx, colName,
          expireOutputOf(v)._1, "full-area", 0.1, false, 10000.0)
      case t: LTable =>
        if (t.entries.isEmpty) return
        if (t.length == 0) err("Expire field must be a Lua array table")
        arrayOf(t).foreach {
          case e: LTable =>
            val out = expireOutputOf(e.rawGet(LStr("output")))._1
            val m = optStr(e, "mode").getOrElse("full-area")
            if (!Set("full-area", "boundary-only", "hybrid").contains(m))
              err(s"Unknown expire mode '$m'.")
            val buffer = e.rawGet(LStr("buffer")) match {
              case LNil => 0.1
              case b => I.coerceNum(b).map(I.asDouble).getOrElse(
                err("Optional expire field 'buffer' must contain a number."))
            }
            val diff = e.rawGet(LStr("diff_expire")) match {
              case LNil     => false
              case LBool(b) => b
              case _ => err("Optional expire field 'diff_expire' must " +
                "contain a boolean.")
            }
            val fal = e.rawGet(LStr("full_area_limit")) match {
              case LNil => 10000.0
              case b => I.coerceNum(b).map(I.asDouble).getOrElse(
                err("Optional expire field 'full_area_limit' must " +
                  "contain a number."))
            }
            expireRefs += FlexLuaEnv.ExpireRef(tableIdx, colName, out, m,
              buffer, diff, fal)
          case _ => err("Expire config must be a Lua table")
        }
      case _ => err("Expire field must be a Lua array table")
    }
  }

  osm2pgsql.rawSet(LStr("define_table"), fnv("define_table") { a =>
    val t = a.headOption match {
      case Some(t: LTable) => t
      case _ => err("Argument #1 to 'define_table' must be a table.")
    }
    // name must be a STRING (luaX_get_table_string rejects other
    // types with the same message, lua-table-definitions.feature)
    val name = t.rawGet(LStr("name")) match {
      case LStr(s) => s
      case _ => err("The table must contain a 'name' string field.")
    }
    // identifier check happens before anything else, like
    // create_flex_table (src/flex-lua-table.cpp:39-45)
    try Flex.checkIdentifier(name, "table names")
    catch { case e: IllegalArgumentException =>
      err(Option(e.getMessage).getOrElse("")
        .stripPrefix("requirement failed: ")) }
    if (tableDefs.exists(_.name == name))
      err(s"Table with name '$name' already exists.")
    val schema = optStr(t, "schema")
    val cluster = t.rawGet(LStr("cluster")) match {
      case LNil         => true
      case LStr("auto") => true
      case LStr("no")   => false
      case LStr(other) => err(s"Unknown value '$other' for 'cluster' " +
        "table option (use 'auto' or 'no').")
      case _ =>
        err("Unknown value for 'cluster' table option: Must be string.")
    }
    // ids (setup_flex_table_id_columns, src/flex-lua-table.cpp:128-196)
    var ids = FlexIds.NoIndex
    var idColumn = "osm_id"
    var idCache = false
    var createIndex = "auto"
    var typeColumn: Option[String] = None
    t.rawGet(LStr("ids")) match {
      case LNil => // legal: insert-only table (warning in the reference)
      case idsT: LTable =>
        val itype = optStr(idsT, "type").getOrElse(
          err("The ids field must contain a 'type' string field."))
        ids = itype match {
          case "node"     => FlexIds.Node
          case "way"      => FlexIds.Way
          case "relation" => FlexIds.Relation
          case "area"     => FlexIds.Area
          case "any"      => FlexIds.AnyObject
          case "tile"     => FlexIds.Tile
          case other      => err(s"Unknown ids type: $other.")
        }
        if (ids == FlexIds.AnyObject) {
          idsT.rawGet(LStr("type_column")) match {
            case LNil    => ()
            case LStr(s) => typeColumn = Some(s)
            case _       => err("type_column must be a string or nil.")
          }
        }
        if (ids != FlexIds.Tile) {
          idCache = optBool(idsT, "cache", "The ids")
          if (idCache && ids != FlexIds.Node)
            err("ID cache only available for node ids.")
          idColumn = optStr(idsT, "id_column").getOrElse(
            err("The ids field must contain a 'id_column' string field."))
        }
        // 'create_index' validated AND recorded; the index build
        // itself is a PG-side DDL concern (parse_create_index,
        // src/flex-lua-table.cpp:108-125)
        optStr(idsT, "create_index").foreach { ci =>
          if (!Set("auto", "always", "unique", "primary_key").contains(ci))
            err(s"Unknown value '$ci' for 'create_index' field of ids")
          createIndex = ci
        }
      case _ => err("The ids field must be a table.")
    }
    // columns (setup_flex_table_columns, src/flex-lua-table.cpp:329-395)
    val myIdx = tableDefs.size
    val cols = t.rawGet(LStr("columns")) match {
      case ct: LTable =>
        arrayOf(ct).map {
          case c: LTable =>
            val ctypeName = optStr(c, "type").getOrElse("text")
            val cname = optStr(c, "column").getOrElse(
              err("Column entry must contain a 'column' string field."))
            val ctype =
              try FlexType.parse(ctypeName)
              catch { case _: IllegalArgumentException =>
                err(s"Unknown column type '$ctypeName'.") }
            val isGeom = FlexType.sparkType(ctype) ==
              org.apache.spark.sql.types.BinaryType
            val proj = c.rawGet(LStr("projection")) match {
              case LNil => Srid.WebMercator
              case p =>
                if (!isGeom)
                  err("Projection can only be set on geometry columns.")
                parseProjection(p)
            }
            parseExpireField(c.rawGet(LStr("expire")), isGeom, proj,
              myIdx, cname)
            FlexColumn(cname, ctype,
              notNull = optBool(c, "not_null", "Entry 'not_null'"),
              createOnly = optBool(c, "create_only", "Entry 'create_only'"),
              projection = proj,
              sqlTypeOverride = optStr(c, "sql_type").filter(_.nonEmpty))
          case _ => err("The entries in the 'columns' array must be tables.")
        }
      case LNil => err(s"No 'columns' field (or not an array) in table " +
        s"'$name'.")
      case _ => err(s"No 'columns' field (or not an array) in table '$name'.")
    }
    // indexes (setup_flex_table_indexes, src/flex-lua-table.cpp:397-441);
    // None = default geometry index, Some(Nil) = explicitly none
    val indexes: Option[Seq[FlexIndex]] = t.rawGet(LStr("indexes")) match {
      case LNil => None
      case ixt: LTable => Some(arrayOf(ixt).map {
        case ix: LTable =>
          // flex_lua_setup_index (src/flex-lua-index.cpp:57-140):
          // exact validation ORDER and wording — method, method
          // validity, column (each checked against the table's
          // columns), name, expression, either-or, include,
          // tablespace, unique, where
          val validColumns = (cols.map(_.name) :+ idColumn).toSet
          def checkColumn(c: String): String =
            if (validColumns(c)) c
            else err(s"Unknown column '$c' in table '$name'.")
          def strOrArray(k: String): Seq[String] =
            ix.rawGet(LStr(k)) match {
              case LNil    => Nil
              case LStr(s) => Seq(checkColumn(s))
              case ca: LTable =>
                val entries = arrayOf(ca).map {
                  case LStr(s) => checkColumn(s)
                  // check_and_add_columns reuses the 'column' wording
                  // for include arrays too (src/flex-lua-index.cpp:46)
                  case _ => err(
                    "The entries in the 'column' array must be strings.")
                }
                if (k == "column" && entries.isEmpty)
                  err("The 'column' field in an index definition can " +
                    "not be an empty array.")
                entries
              case _ => err(s"The '$k' field in an index definition " +
                "must contain a string or an array.")
            }
          val method = ix.rawGet(LStr("method")) match {
            case LStr(s) => s
            case _ =>
              err("Index definition must contain a 'method' string field.")
          }
          if (!FlexLuaEnv.indexMethods(method))
            err(s"Unknown index method '$method'.")
          val cols0 = strOrArray("column")
          val idxName = defStr(ix, "name", "Index definition", "")
          val expression = defStr(ix, "expression", "Index definition", "")
          if (expression.isEmpty == cols0.isEmpty)
            err("You must set either the 'column' or the 'expression' " +
              "field in index definition.")
          val include = strOrArray("include")
          val tablespace = defStr(ix, "tablespace", "Index definition", "")
          val unique = optBool(ix, "unique", "Index definition")
          val where = defStr(ix, "where", "Index definition", "")
          try FlexIndex(method, columns = cols0,
            expression = expression,
            name = idxName,
            unique = unique,
            includeColumns = include,
            fillfactor = optInt(ix, "fillfactor").map(_.toInt).getOrElse(0),
            tablespace = tablespace,
            where = where)
          catch { case e: IllegalArgumentException =>
            err(Option(e.getMessage).getOrElse("")
              .stripPrefix("requirement failed: ")) }
        case _ => err("The entries in the 'indexes' array must be Lua tables.")
      })
      case _ => err(s"The 'indexes' field in definition of table '$name' " +
        "is not an array.")
    }
    val tdef =
      try FlexTableDef(name, ids, cols, indexes = indexes,
        cluster = cluster, idColumn = idColumn, idCache = idCache,
        typeColumn = typeColumn, schemaName = schema,
        createIndex = createIndex)
      catch { case e: IllegalArgumentException =>
        err(Option(e.getMessage).getOrElse("")
          .stripPrefix("requirement failed: ")) }
    tableDefs += tdef
    Seq(new LUserdata(Integer.valueOf(myIdx), Some(tableMeta)))
  })

  // ---------- run_gen / run_sql (osm2pgsql-gen context) ----------

  osm2pgsql.rawSet(LStr("run_gen"), fnv("run_gen") { a =>
    val strategy = a.headOption match {
      case Some(LStr(s)) => s
      case _ => err("Argument #1 to 'run_gen' must be a string.")
    }
    val params = a.lift(1) match {
      case Some(t: LTable) =>
        t.entries.collect { case (LStr(k), v) => k -> I.tostring(v) }.toMap
      case _ => Map.empty[String, String]
    }
    val src = params.getOrElse("src_table",
      err("Missing 'src_table' parameter in run_gen."))
    val dest = params.getOrElse("dest_table",
      err("Missing 'dest_table' parameter in run_gen."))
    genSteps += FlexGenStep(strategy, src, dest,
      params -- Seq("src_table", "dest_table", "name", "debug"))
    Nil
  })
  osm2pgsql.rawSet(LStr("run_sql"), fnv("run_sql") { a =>
    // recorded-as-step: tile-sql / raw SQL steps are dispatched by
    // GenRunner against the landed tables (gen-base.cpp run_sql)
    a.headOption match {
      case Some(t: LTable) =>
        val sqls = t.rawGet(LStr("sql")) match {
          case LStr(s)    => Seq(s)
          case st: LTable => arrayOf(st).map(I.tostring)
          case _ => err("Missing 'sql' parameter in run_sql.")
        }
        genSteps += FlexGenStep("sql", "", "",
          Map("description" -> optStr(t, "description").getOrElse("")) ++
            sqls.zipWithIndex.map { case (s, i) => s"sql_$i" -> s })
        Nil
      case _ => err("Argument #1 to 'run_sql' must be a Lua table.")
    }
  })

  // ---------- OSMObject class ----------

  private val osmObjectMeta = new LTable
  private val osmObjectIndex = new LTable
  osmObjectMeta.rawSet(LStr("__index"), osmObjectIndex)
  osm2pgsql.rawSet(LStr("OSMObject"), osmObjectMeta)

  private def ctxObject(fname: String): LuaOsmObject = {
    if (currentObject == null)
      err(s"The function $fname() can only be called from the " +
        "process_[untagged]_*() functions.")
    currentObject
  }
  private def contextCheck(fname: String, where: String, ok: Boolean): Unit =
    if (!ok)
      err(s"The function $fname() can only be called (directly or " +
        s"indirectly) from the process_[untagged]_$where() functions.")

  private def toPts(lons: Seq[Double], lats: Seq[Double]): Seq[Pt] =
    lons.zip(lats).map { case (x, y) => Pt(x, y) }

  private def objFn(name: String)(f: LuaOsmObject => Seq[LV]): Unit =
    osmObjectIndex.rawSet(LStr(name), fnv(name)(_ => f(ctxObject(name))))

  objFn("get_bbox") { o =>
    // app_get_bbox (src/output-flex.cpp:402-451): 4 return values
    // min_lon, min_lat, max_lon, max_lat; nothing when no location
    callingContext match {
      case "node" =>
        Seq(LNum(o.lon), LNum(o.lat), LNum(o.lon), LNum(o.lat))
      case "way" =>
        if (o.lons == null || o.lons.isEmpty) Nil
        else Seq(LNum(o.lons.min), LNum(o.lats.min),
          LNum(o.lons.max), LNum(o.lats.max))
      case "relation" =>
        val xs = Option(o.mnlons).getOrElse(Nil) ++
          Option(o.mlons).getOrElse(Nil).flatten
        val ys = Option(o.mnlats).getOrElse(Nil) ++
          Option(o.mlats).getOrElse(Nil).flatten
        if (xs.isEmpty) Nil
        else Seq(LNum(xs.min), LNum(ys.min), LNum(xs.max), LNum(ys.max))
      case _ => err("The function get_bbox() can only be called (directly " +
        "or indirectly) from the process_[untagged]_node/way/relation() " +
        "functions.")
    }
  }

  osmObjectIndex.rawSet(LStr("as_point"), fnv("as_point") { a =>
    val o = ctxObject("as_point")
    callingContext match {
      case "node" =>
        if (a.size > 1) err("No parameter(s) needed for as_point().")
        Seq(wrapGeom(FromOsm.createPoint(o.lon, o.lat)))
      case "way" =>
        // as_point(n) on a way: nth node, negative counts from the
        // back, out of range → null geometry (output-flex.cpp:453-497)
        if (a.size > 2) err("Too many arguments for function as_point()")
        val size = if (o.lons == null) 0 else o.lons.size
        var n = a.lift(1) match {
          case None | Some(LNil) => 1L
          case Some(v) => I.toInteger(v).getOrElse(
            err("Argument #1 to 'as_point()' must be an integer."))
        }
        if (n < 0) n += size + 1
        if (n > 0 && n <= size)
          Seq(wrapGeom(FromOsm.createPoint(o.lons((n - 1).toInt),
            o.lats((n - 1).toInt))))
        else Seq(wrapGeom(NullGeom()))
      case _ => err("The function as_point() can only be called (directly " +
        "or indirectly) from the process_[untagged]_node/way() functions.")
    }
  })

  objFn("as_linestring") { o =>
    contextCheck("as_linestring", "way", callingContext == "way")
    if (o.lons == null) Seq(wrapGeom(NullGeom()))
    else Seq(wrapGeom(FromOsm.createLineString(toPts(o.lons, o.lats))))
  }
  objFn("as_polygon") { o =>
    contextCheck("as_polygon", "way", callingContext == "way")
    if (o.lons == null) Seq(wrapGeom(NullGeom()))
    else Seq(wrapGeom(FromOsm.createPolygon(toPts(o.lons, o.lats))))
  }
  objFn("as_multipoint") { o =>
    contextCheck("as_multipoint", "node/relation",
      callingContext == "node" || callingContext == "relation")
    if (callingContext == "node")
      Seq(wrapGeom(FromOsm.createPoint(o.lon, o.lat)))
    else if (o.mnlons == null) Seq(wrapGeom(NullGeom()))
    else Seq(wrapGeom(FromOsm.createMultiPoint(toPts(o.mnlons, o.mnlats))))
  }
  objFn("as_multilinestring") { o =>
    contextCheck("as_multilinestring", "way/relation",
      callingContext == "way" || callingContext == "relation")
    if (callingContext == "way") {
      if (o.lons == null) Seq(wrapGeom(NullGeom()))
      else Seq(wrapGeom(FromOsm.createLineString(toPts(o.lons, o.lats))))
    } else if (o.mlons == null) Seq(wrapGeom(NullGeom()))
    // force_multi = false (app_as_multilinestring passes false):
    // a single-member relation yields a plain LINESTRING
    // (geometry-multilinestring.feature row R 30)
    else Seq(wrapGeom(FromOsm.createMultiLineString(
      o.mlons.zip(o.mlats).map { case (lo, la) => toPts(lo, la) },
      forceMulti = false)))
  }
  objFn("as_multipolygon") { o =>
    contextCheck("as_multipolygon", "way/relation",
      callingContext == "way" || callingContext == "relation")
    if (callingContext == "way") {
      if (o.lons == null) Seq(wrapGeom(NullGeom()))
      else Seq(wrapGeom(FromOsm.createPolygon(toPts(o.lons, o.lats))))
    } else if (o.mlons == null) Seq(wrapGeom(NullGeom()))
    else Seq(wrapGeom(FromOsm.createMultiPolygon(
      o.mlons.zip(o.mlats).map { case (lo, la) => toPts(lo, la) })))
  }
  objFn("as_geometrycollection") { o =>
    contextCheck("as_geometrycollection", "relation",
      callingContext == "relation")
    val pts = if (o.mnlons == null) Seq.empty[Pt] else toPts(o.mnlons, o.mnlats)
    val ways = if (o.mlons == null) Seq.empty[Seq[Pt]]
      else o.mlons.zip(o.mlats).map { case (lo, la) => toPts(lo, la) }
    Seq(wrapGeom(FromOsm.createCollection(pts, ways)))
  }

  // ---------- environment fields + init helper layer ----------

  osm2pgsql.rawSet(LStr("version"), LStr("2.3.0"))
  osm2pgsql.rawSet(LStr("mode"), LStr(mode))
  osm2pgsql.rawSet(LStr("stage"), LInt(stage.toLong))
  osm2pgsql.rawSet(LStr("config_dir"), LStr(configDir))
  private val propsT = new LTable
  properties.foreach { case (k, v) => propsT.rawSet(LStr(k), LStr(v)) }
  osm2pgsql.rawSet(LStr("properties"), propsT)

  // The Lua-side helper layer (contracts from src/init.lua, written
  // fresh; trim's pattern trick replaced by plain matches).
  private val initChunk = """
local function impl_define(kind, name, columns, options)
  options = options or {}
  options.name = name
  options.ids = { type = kind, id_column = kind .. '_id' }
  options.columns = columns
  return osm2pgsql.define_table(options)
end
function osm2pgsql.define_node_table(n, c, o)
  return impl_define('node', n, c, o)
end
function osm2pgsql.define_way_table(n, c, o)
  return impl_define('way', n, c, o)
end
function osm2pgsql.define_relation_table(n, c, o)
  return impl_define('relation', n, c, o)
end
function osm2pgsql.define_area_table(n, c, o)
  return impl_define('area', n, c, o)
end

function osm2pgsql.has_prefix(str, prefix)
  if str == nil then return nil end
  return str:sub(1, #prefix) == prefix
end
function osm2pgsql.has_suffix(str, suffix)
  if str == nil then return nil end
  if suffix == '' then return true end
  return str:sub(-#suffix) == suffix
end

function osm2pgsql.node_member_ids(relation)
  local ids = {}
  for _, m in ipairs(relation.members) do
    if m.type == 'n' then ids[#ids + 1] = m.ref end
  end
  return ids
end
function osm2pgsql.way_member_ids(relation)
  local ids = {}
  for _, m in ipairs(relation.members) do
    if m.type == 'w' then ids[#ids + 1] = m.ref end
  end
  return ids
end

function osm2pgsql.clamp(value, low, high)
  if value == nil then return nil end
  return math.min(math.max(value, low), high)
end

function osm2pgsql.make_check_values_func(list, default)
  local valid = {}
  if default ~= nil then
    setmetatable(valid, { __index = function() return default end })
  end
  for _, v in ipairs(list) do valid[v] = v end
  return function(value) return valid[value] end
end

function osm2pgsql.make_clean_tags_func(keys)
  local del_keys, del_prefixes, del_suffixes = {}, {}, {}
  for _, k in ipairs(keys) do
    if k:sub(-1) == '*' then
      del_prefixes[#del_prefixes + 1] = k:sub(1, -2)
    elseif k:sub(1, 1) == '*' then
      del_suffixes[#del_suffixes + 1] = k:sub(2)
    else
      del_keys[#del_keys + 1] = k
    end
  end
  return function(tags)
    for _, k in ipairs(del_keys) do tags[k] = nil end
    if next(tags) == nil then return true end
    for tag, _ in pairs(tags) do
      for _, k in ipairs(del_prefixes) do
        if osm2pgsql.has_prefix(tag, k) then tags[tag] = nil; break end
      end
    end
    for tag, _ in pairs(tags) do
      for _, k in ipairs(del_suffixes) do
        if osm2pgsql.has_suffix(tag, k) then tags[tag] = nil; break end
      end
    end
    return next(tags) == nil
  end
end

function osm2pgsql.trim(str)
  if str == nil then return nil end
  return (str:gsub('^%s+', ''):gsub('%s+$', ''))
end

function osm2pgsql.split_unit(str, default_unit)
  if str == nil then return nil end
  local val, unit = string.match(str, '^(-?[0-9.]+) ?(%a*)$')
  if val == nil then return nil end
  if unit == '' then unit = default_unit end
  return tonumber(val), unit
end

function osm2pgsql.split_string(str, separator)
  local result = {}
  if str ~= nil then
    local pattern = '([^' .. (separator or ';') .. ']+)'
    for w in string.gmatch(str, pattern) do
      result[#result + 1] = osm2pgsql.trim(w)
    end
  end
  return result
end

osm2pgsql.OSMObject.__index.grab_tag = function(data, tag)
  if not tag then
    error('Missing tag key', 2)
  end
  local v = data.tags[tag]
  data.tags[tag] = nil
  return v
end

function osm2pgsql.Geometry.geometries(geom)
  local i = 0
  local max = #geom
  return function()
    i = i + 1
    if i <= max then return geom:geometry_n(i) end
  end
end
"""
  I.run(LuaParser.parse(initChunk, "init"))

  // ---------- loading + object dispatch ----------

  /** Load the user's config chunk (luaL_dofile analog). Define-time
    * Lua errors surface as [[LuaInterp.LuaRuntimeError]] with the
    * reference's message texts. */
  def loadSource(src: String): Unit =
    I.run(LuaParser.parse(src, chunkName))

  def callback(name: String): Option[LV] =
    osm2pgsql.rawGet(LStr(name)) match {
      case LNil        => None
      case f: LFunc    => Some(f)
      case f: LBuiltin => Some(f)
      case _ => throw new IllegalArgumentException(
        s"osm2pgsql.$name must be a function.")
    }

  /** Build the Lua `object` table (push_osm_object_to_lua_stack,
    * src/output-flex.cpp:121-195): absent optional attributes stay
    * nil, ways add is_closed + nodes, relations add members. */
  def pushObject(o: LuaOsmObject): LTable = {
    val t = new LTable
    t.rawSet(LStr("id"), LInt(o.id))
    t.rawSet(LStr("type"), LStr(o.otype))
    o.version.filter(_ != 0L).foreach(v =>
      t.rawSet(LStr("version"), LInt(v)))
    o.timestamp.filter(_ != 0L).foreach(v =>
      t.rawSet(LStr("timestamp"), LInt(v)))
    o.changeset.filter(_ != 0L).foreach(v =>
      t.rawSet(LStr("changeset"), LInt(v)))
    o.uid.filter(_ != 0L).foreach(v => t.rawSet(LStr("uid"), LInt(v)))
    o.user.filter(_.nonEmpty).foreach(v => t.rawSet(LStr("user"), LStr(v)))
    if (o.deleted) {
      // attributes only; no tags/nodes/members and no OSMObject
      // metatable (push_osm_object_to_lua_stack:157-195 skips them)
      return t
    }
    if (o.otype == "way") {
      t.rawSet(LStr("is_closed"), LBool(o.nodeRefs.nonEmpty &&
        o.nodeRefs.head == o.nodeRefs.last))
      t.rawSet(LStr("nodes"), LTable.fromSeq(o.nodeRefs.map(LInt)))
    } else if (o.otype == "relation") {
      t.rawSet(LStr("members"), LTable.fromSeq(o.members.map {
        case (mt, ref, role) => LTable.of(
          LStr("type") -> LStr(mt),
          LStr("ref") -> LInt(ref),
          LStr("role") -> LStr(role))
      }))
    }
    val tags = new LTable
    o.tags.foreach { case (k, v) => tags.rawSet(LStr(k), LStr(v)) }
    t.rawSet(LStr("tags"), tags)
    t.metatable = Some(osmObjectMeta)
    t
  }

  /** Call a process_* callback with the object as context. Lua
    * errors wrap in the reference's text ("Failed to execute Lua
    * function 'osm2pgsql.<name>': ...", output-flex.cpp:887-906) so
    * a failing config reports identically. */
  def callProcess(fn: LV, o: LuaOsmObject,
      fnName: String = null): Seq[LV] = {
    val prev = (currentObject, callingContext)
    currentObject = o
    callingContext = o.otype
    try I.call(fn, Seq(pushObject(o)))
    catch {
      case e: I.LuaRuntimeError =>
        val name = Option(fnName).getOrElse(s"process_${o.otype}")
        throw new RuntimeException("Failed to execute Lua function " +
          s"'osm2pgsql.$name': ${LuaInterp.tostringStatic(e.value)}.", e)
    }
    finally { currentObject = prev._1; callingContext = prev._2 }
  }

  /** Call select_relation_members (1 result; src/output-flex.cpp:
    * 1000-1015 + expected-result parsing): returns the marked way and
    * node ids from the result's `ways`/`nodes` arrays. */
  def callSelectRelationMembers(fn: LV, o: LuaOsmObject)
      : (Seq[Long], Seq[Long]) = {
    val prev = (currentObject, callingContext)
    currentObject = o
    callingContext = "select_relation_members"
    try {
      I.call(fn, Seq(pushObject(o))).headOption match {
        case Some(r: LTable) =>
          def idsOf(k: String): Seq[Long] = r.rawGet(LStr(k)) match {
            case t: LTable => arrayOf(t).flatMap(I.toInteger)
            case LNil      => Nil
            case _ => err(s"Expected a table with ids in the '$k' field.")
          }
          (idsOf("ways"), idsOf("nodes"))
        case Some(LNil) | None => (Nil, Nil)
        case Some(_) =>
          err("select_relation_members must return nil or a table.")
      }
    } finally { currentObject = prev._1; callingContext = prev._2 }
  }
}

object FlexLuaEnv {
  /** The reference validates index methods against the database's
    * pg_am catalog (has_index_method, src/pgsql-capabilities.cpp:189);
    * stock PostgreSQL ships exactly these six. */
  val indexMethods: Set[String] =
    Set("btree", "hash", "gist", "gin", "spgist", "brin")

  /** One column-level expire reference (expire_config_t,
    * src/expire-config.hpp): which output index, cover mode, buffer,
    * diff flag and the hybrid-mode area threshold. */
  final case class ExpireRef(tableIdx: Int, column: String, output: Int,
      mode: String, buffer: Double, diffExpire: Boolean,
      fullAreaLimit: Double)
}
