package graft.cli

import org.apache.spark.sql.SparkSession

import graft.classic.{ClassicPipeline, StyleFile}
import graft.sources.{OsmSource, Validate}

/** `graft.cli.Main [options] files…` — the osm2pgsql command surface
  * on this engine: read the inputs (any format, k-way merged), run
  * the classic pgsql output pipeline under the style file, and land
  * the four tables as parquet under --output-dir. `-e` also writes
  * the dirty-tile list (capped and streamed, never collected whole).
  *
  * With `-d <dsn>`: when the server is reachable the tables are
  * loaded LIVE end to end, exactly like the reference's one-command
  * run (src/osm2pgsql.cpp:47-83): create = DROP → CREATE UNLOGGED →
  * COPY → indexes/ANALYZE; append = transactional delete-before-
  * insert keyed on the pending id closure. When unreachable, create
  * mode lands the load artifacts instead — `ddl.sql` plus executor-
  * formatted COPY files per table under `copy/` — and `jdbc_url.txt`
  * always records the JDBC form of the DSN.
  *
  * `-O flex -S <object>` runs a compiled [[graft.flex.FlexConfig]]
  * named by its fully-qualified Scala object name — the typed analog
  * of `-O flex -S config.lua` (a Lua file cannot express a typed
  * Scala config; documented delta). Way rows reach the config's
  * callbacks enriched with `__geom`, the resolved 3857 linestring —
  * the analog of the Lua callback's `object:as_linestring()` against
  * the middle. Each output table lands as parquet under --output-dir.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val o =
      try Options.parse(args.toIndexedSeq)
      catch { case Options.ExitEarly(code) => sys.exit(code) }
    val spark = SparkSession.builder()
      .master(s"local[${o.numProcesses}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", o.numProcesses)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(o.logLevel match {
      case "debug" => "INFO" // spark's DEBUG is firehose; INFO is the analog
      case "info"  => "WARN"
      case _       => "ERROR"
    })
    val t0 = System.nanoTime()
    try run(spark, o)
    finally {
      spark.stop()
      // the reference's closing line (src/osm2pgsql.cpp:386; format
      // util::human_readable_duration, src/util.cpp:23-41) — scripts
      // parse it, so keep the exact shape
      System.err.println("osm2pgsql took " +
        humanDuration((System.nanoTime() - t0) / 1000000000L) + " overall.")
    }
  }

  /** "{s}s", "{s}s ({m}m {s}s)", "{s}s ({h}h {m}m {s}s)" —
    * util::human_readable_duration (src/util.cpp:23-41). */
  def humanDuration(seconds: Long): String =
    if (seconds < 60) s"${seconds}s"
    else if (seconds < 3600)
      s"${seconds}s (${seconds / 60}m ${seconds % 60}s)"
    else s"${seconds}s (${seconds / 3600}h ${seconds / 60 % 60}m " +
      s"${seconds % 60}s)"

  def run(spark: SparkSession, o0: Options): Unit = {
    // append runs resolve their effective options against the stored
    // import properties FIRST (check_and_update_properties,
    // src/osm2pgsql.cpp:300-309): unspecified options inherit the
    // stored values, specified ones must agree, with the reference's
    // messages either way
    val o: Options =
      if (!o0.append) o0
      else scala.util.Try(graft.sinks.Properties.load(spark,
        s"${o0.outputDir}/properties")).toOption match {
        case None => o0
        case Some(p) =>
          graft.sinks.Properties.resolveAppend(p,
            graft.sinks.Properties.AppendOptions(
              attributes = if (o0.extraAttributes) Some(true) else None,
              prefix = if (o0.prefixSet) Some(o0.prefix) else None,
              flatNodeFile = o0.flatNodes.map(f => java.nio.file.Paths
                .get(f).toAbsolutePath.toString),
              output = if (o0.outputSet) Some(o0.output) else None,
              style = o0.styleFile.map(f => java.nio.file.Paths
                .get(f).toAbsolutePath.toString))) match {
            case Left(err) => Options.fail(err)
            case Right(r) =>
              r.messages.foreach(m => System.err.println(s"[graft] $m"))
              o0.copy(
                prefix = r.settings("prefix"),
                extraAttributes = r.settings("attributes") == "true",
                output = r.settings("output"),
                flatNodes =
                  Option(r.settings("flat_node_file")).filter(_.nonEmpty),
                // "default.style" is the built-in-style marker, not a
                // file on disk
                styleFile = Option(r.settings("style"))
                  .filter(s => s.nonEmpty && s != "default.style"))
          }
      }
    graft.sinks.PgLive.logSql = o.logSql || o.logSqlData
    graft.sinks.PgLive.logSqlData = o.logSqlData
    val osm0 = OsmSource.read(spark, o.inputFiles, o.inputReader)
    val nodes = o.bbox match {
      case Some((minLon, minLat, maxLon, maxLat)) =>
        Validate.bboxFilter(osm0.nodes, minLon, minLat, maxLon, maxLat)
      case None => osm0.nodes
    }
    val osm = osm0.copy(nodes = nodes)

    if (o.output == "null") {
      // like the reference: parse + middle only, no output tables
      osm.nodes.count(); osm.ways.count(); osm.relations.count()
      return
    }

    if (o.output == "flex") { runFlex(spark, o, osm); return }

    val style = o.styleFile match {
      case Some(f) => StyleFile.parse(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8"))
      case None => StyleFile.defaultStyle
    }
    val out = java.nio.file.Paths.get(o.outputDir)
    java.nio.file.Files.createDirectories(out)
    def tableNames = Seq(s"${o.prefix}_point", s"${o.prefix}_line",
      s"${o.prefix}_polygon", s"${o.prefix}_roads")

    // a reachable -d server gets the live load; an unreachable one
    // degrades to artifacts (create mode) with a note
    val liveDsn: Option[String] =
      o.database.filter(graft.sinks.PgLive.reachable)
    val pgTables = graft.sinks.PgClassic.tables(o.prefix, style, o.hstore,
      o.hstoreColumns, o.srid)
    // the hstore extension is needed for -k/-j AND for any -z column
    val needHstore = o.hstore || o.hstoreColumns.nonEmpty

    val tables =
      if (!o.append) {
        val t = ClassicPipeline.run(osm, style, srid = o.srid,
          hstore = o.hstore, hstoreMatchOnly = o.hstoreMatchOnly,
          extraAttributes = o.extraAttributes,
          tagTransform = o.tagTransformScript
            .map(graft.classic.LuaTagTransform.fromFile(_,
              o.extraAttributes))
            .getOrElse(ClassicPipeline.TagTransform()),
          keepCoastlines = o.keepCoastlines,
          multiGeometry = o.multiGeometry,
          reprojectArea = o.reprojectArea,
          hstoreColumns = o.hstoreColumns)
        // --slim: persist the middle so --append can pick up from here
        // (the flat-nodes/slim-tables analog: the raw entity frames)
        if (o.slim && !o.drop) {
          osm.nodes.write.mode("overwrite").parquet(s"$out/${o.middleDir}/nodes")
          osm.ways.write.mode("overwrite").parquet(s"$out/${o.middleDir}/ways")
          osm.relations.write.mode("overwrite")
            .parquet(s"$out/${o.middleDir}/relations")
        }
        // the osm2pgsql_properties analog (src/osm2pgsql.cpp:102-145):
        // import settings + the single input's PBF-header replication
        // info when present, so `replication init` can start from the
        // import alone (store_data_properties)
        val replProps = (o.inputFiles match {
          case Seq(single) if single.endsWith(".pbf") =>
            scala.util.Try(graft.sources.OsmPbf.readHeader(single)).toOption
          case _ => None
        }).map { h =>
          h.replicationBaseUrl.map("replication_base_url" -> _).toMap ++
            h.replicationSequence
              .map(s => "replication_sequence_number" -> s.toString) ++
            h.replicationTimestamp
              .map(t => "replication_timestamp" -> t.toString)
        }.getOrElse(Map.empty)
        graft.sinks.Properties.save(spark, s"$out/properties",
          graft.sinks.Properties.importProperties(osm,
            attributes = o.extraAttributes, prefix = o.prefix,
            updatable = o.slim && !o.drop, output = o.output,
            // the reference stores the ABSOLUTE style path
            // (src/osm2pgsql.cpp:121-128); "default.style" marks the
            // built-in style
            style = o.styleFile.map(f => java.nio.file.Paths.get(f)
              .toAbsolutePath.toString).getOrElse("default.style"),
            // the reference stores the ABSOLUTE flat-nodes path
            // (src/osm2pgsql.cpp:210)
            flatNodeFile = o.flatNodes.map(f => java.nio.file.Paths
              .get(f).toAbsolutePath.toString).getOrElse("")) ++ replProps)
        t
      } else {
        // the reference's append flow (src/osmdata.cpp:371-406):
        // change ids → dependency closure → re-derive subset →
        // delete-then-insert against the previous tables (the
        // properties resolution at the top of run() already vetted
        // updatable/prefix/attributes/flat-nodes/output).
        val spark2 = spark
        def loadMiddle = graft.sources.OsmXml.OsmDataFrames(
          spark2.read.parquet(s"$out/${o.middleDir}/nodes"),
          spark2.read.parquet(s"$out/${o.middleDir}/ways"),
          spark2.read.parquet(s"$out/${o.middleDir}/relations"))
        val before = loadMiddle
        val prev = ClassicPipeline.Tables4(
          spark2.read.parquet(s"$out/${o.prefix}_point"),
          spark2.read.parquet(s"$out/${o.prefix}_line"),
          spark2.read.parquet(s"$out/${o.prefix}_polygon"),
          spark2.read.parquet(s"$out/${o.prefix}_roads"))
        val delta = graft.classic.ClassicUpdate.computeDelta(
          before, osm, style, srid = o.srid,
          hstore = o.hstore, hstoreMatchOnly = o.hstoreMatchOnly,
          extraAttributes = o.extraAttributes,
          keepCoastlines = o.keepCoastlines,
          multiGeometry = o.multiGeometry,
          reprojectArea = o.reprojectArea,
          hstoreColumns = o.hstoreColumns)
        // the live delete-before-insert must run BEFORE the staged
        // parquet swap below — its plans read the current files
        liveDsn.foreach { dsn =>
          val postgis =
            graft.sinks.ClassicPgLoad.prepareServer(dsn, needHstore)
          graft.sinks.ClassicPgLoad.append(pgTables, delta, dsn,
            o.tableSchema, o.hstoreAll, postgis)
        }
        val t = graft.classic.ClassicUpdate.applyDelta(prev, delta)
        // updated middle: latest-version-wins merge of base + changes
        val merged = graft.classic.ClassicUpdate.applyChanges(before, osm)
        // plans read the CURRENT files, so stage everything first and
        // swap after all actions complete
        merged.nodes.write.mode("overwrite")
          .parquet(s"$out/${o.middleDir}_new/nodes")
        merged.ways.write.mode("overwrite").parquet(s"$out/${o.middleDir}_new/ways")
        merged.relations.write.mode("overwrite")
          .parquet(s"$out/${o.middleDir}_new/relations")
        t
      }

    val named = Seq(
      s"${o.prefix}_point"   -> tables.point,
      s"${o.prefix}_line"    -> tables.line,
      s"${o.prefix}_polygon" -> tables.polygon,
      s"${o.prefix}_roads"   -> tables.roads)
    if (!o.append) {
      named.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$out/$name")
      }
    } else {
      // append plans read the previous tables: stage, then swap both
      // the tables and the middle
      named.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$out/${name}_new")
      }
      def swap(from: String, to: String): Unit = {
        val dst = new java.io.File(s"$out/$to")
        org.apache.commons.io.FileUtils.deleteDirectory(dst)
        org.apache.commons.io.FileUtils
          .moveDirectory(new java.io.File(s"$out/$from"), dst)
      }
      named.foreach { case (name, _) => swap(s"${name}_new", name) }
      swap(s"${o.middleDir}_new", o.middleDir)
      // advance the recorded data timestamps to the newest applied
      // change (the reference re-runs store_data_properties on append);
      // ISO-8601 Z strings compare correctly as strings
      scala.util
        .Try(graft.sinks.Properties.load(spark, s"$out/properties"))
        .foreach { prev =>
          val fresh = graft.sinks.Properties.importProperties(osm)
          val tsKeys = Seq("import_timestamp", "current_timestamp")
          val merged = prev ++ tsKeys.flatMap { k =>
            fresh.get(k).map(v => k ->
              prev.get(k).filter(_ >= v).getOrElse(v))
          }
          graft.sinks.Properties.save(spark, s"$out/properties", merged)
        }
    }

    // create-mode database step: live load from the landed parquet
    // (zero recompute — exactly the written rows), or the load
    // artifacts when the server is unreachable
    if (!o.append) o.database.foreach { dsn =>
      liveDsn match {
        case Some(live) =>
          val postgis =
            graft.sinks.ClassicPgLoad.prepareServer(live, needHstore)
          pgTables.foreach { t =>
            graft.sinks.ClassicPgLoad.createLoad(t,
              spark.read.parquet(s"$out/${t.name}"), live, o.tableSchema,
              o.hstoreAll, o.slim && !o.drop, postgis,
              hstoreIndex = o.hstoreAddIndex,
              tablespace = o.tablespaceMainData,
              tablespaceIndex = o.tablespaceMainIndex)
          }
        case None =>
          System.err.println(s"[graft] '$dsn' unreachable — writing " +
            "DDL + COPY artifacts instead of loading live")
          val ddl = pgTables.flatMap(t =>
            Seq(graft.sinks.PgClassic.dropDdl(t, o.tableSchema),
              graft.sinks.PgClassic.createDdl(t, o.tableSchema,
                tablespace = o.tablespaceMainData)) ++
              graft.sinks.PgClassic.postLoadDdl(t, o.slim, o.tableSchema,
                hstoreIndex = o.hstoreAddIndex,
                tablespaceIndex = o.tablespaceMainIndex))
          java.nio.file.Files.writeString(out.resolve("ddl.sql"),
            ddl.mkString("", ";\n", ";\n"))
          pgTables.foreach { t =>
            graft.sinks.PgClassic.copyLines(
              graft.sinks.PgClassic.copyFrame(
                spark.read.parquet(s"$out/${t.name}"), t, o.hstoreAll),
              t).write.mode("overwrite").text(s"$out/copy/${t.name}")
          }
      }
    }

    // expire: dirty tiles of every tagged entity processed this run
    // (points included — the parquet point table carries lon/lat, not
    // EWKB, so the cover comes from the entity frames directly).
    // Both reference caps apply (src/expire-output.hpp:24-25): the
    // per-geometry cap inside the cover, the overall cap on the
    // streamed write — the tile list is never collected whole.
    if (o.expireZoomMax > 0) {
      val dest = o.expireOutput.getOrElse(s"$out/dirty_tiles.txt")
      val w = java.nio.file.Files.newBufferedWriter(
        java.nio.file.Paths.get(dest))
      // tile expiry only applies in web-mercator output — the
      // reference's expire_tiles::from_geometry_if_3857 is a no-op for
      // any other projection, leaving the expire file empty
      try if (o.srid == graft.geom.Srid.WebMercator) {
        val limits = graft.operators.TileCover.Limits()
        // hybrid mode is the classic default: polygons larger than
        // --expire-bbox-size expire boundary-only
        // (output-pgsql.cpp:462-466, options.hpp:99)
        val mode =
          if (o.expireBboxSize > 0)
            graft.operators.TileCover.Hybrid(o.expireBboxSize)
          else graft.operators.TileCover.FullArea
        val cover = graft.operators.Expire.fromOsmEntities(osm,
          graft.operators.TileCover.Config(zoom = o.expireZoomMax,
            mode = mode),
          maxTilesPerGeometry = limits.maxTilesPerGeometry)
        val tiles = graft.operators.Expire.rollup(cover, "x", "y",
          o.expireZoomMax, o.expireZoomMin)
        val it = graft.operators.Expire.formatTiles(tiles)
          .orderBy("tile").toLocalIterator()
        var n = 0L
        while (it.hasNext && n < limits.maxTilesOverall) {
          w.write(it.next().getString(0)); w.write("\n"); n += 1
        }
        if (it.hasNext)
          System.err.println("[graft] Overall tile limit reached — " +
            "dirty-tile list truncated at " + limits.maxTilesOverall)
      } finally w.close()
    }

    // the JDBC form of the DSN for downstream loaders
    o.database.foreach { dsn =>
      val url = graft.sinks.PgSink.jdbcUrlFromDsn(dsn)
      java.nio.file.Files.writeString(out.resolve("jdbc_url.txt"),
        url + "\n")
    }
  }

  /** -O flex: load the named compiled config, enrich ways with the
    * resolved `__geom` linestring, run [[graft.flex.FlexRunner]], and
    * land each output table as parquet (an action on the runner's
    * frames also realizes its observable insert counters). */
  private def runFlex(spark: SparkSession, o: Options,
      osm: graft.sources.OsmXml.OsmDataFrames): Unit = {
    import org.apache.spark.sql.functions._
    val name = o.styleFile.getOrElse(Options.fail(
      "The flex output requires a style: the fully-qualified name of " +
        "a compiled graft.flex.FlexConfig object (-S)."))
    val cfg = loadFlexConfig(name, o.append, o.database,
      luaPropertiesOf(o))
    // osm2pgsql.mode for configs (track-changes.lua gates on it):
    // a literal __mode column on every entity frame; enrichment in
    // graft.flex.Enrich (shared with the spec harness)
    val mode = if (o.append) "append" else "create"
    val res = graft.flex.FlexRunner.run(cfg,
      graft.flex.Enrich.forFlex(osm, mode))
    val out = java.nio.file.Paths.get(o.outputDir)
    java.nio.file.Files.createDirectories(out)
    res.tables.foreach { case (tname, tr) =>
      tr.rows.write.mode("overwrite").parquet(s"$out/$tname")
    }

    // process_gen analog: the config's generalization steps run after
    // the load against the landed tables, writing the declared dest
    // tables (osm2pgsql-gen's run_gen, flex-config/gen/forests.lua)
    cfg.genSteps.foreach { g =>
      val src = spark.read.parquet(s"$out/${g.srcTable}")
      val result = graft.operators.GenRunner.runGen(g.strategy, src,
        g.params)
      val projected = cfg.tables.find(_.name == g.destTable) match {
        case Some(d) =>
          val wanted = d.schema.fieldNames.filter(result.columns.contains)
          result.select(wanted.map(col(_)): _*)
        case None => result
      }
      projected.write.mode("overwrite").parquet(s"$out/${g.destTable}")
    }

    // expire outputs (expire_output_t::output, src/expire-output.cpp:
    // 71-141): filename → sorted z/x/y lines APPENDED like the
    // reference's fopen("a"); table → CREATE IF NOT EXISTS + set-based
    // upsert (the reference's per-tile prepared INSERT .. ON CONFLICT
    // collapses to one INSERT..SELECT over a COPY'd temp table). Both
    // stream through toLocalIterator under the overall cap — the tile
    // list is never collected whole.
    if (res.expire.nonEmpty) {
      val outputs = cfg.tables
        .flatMap(_.columns.flatMap(_.expire.map(_.output)))
        .map(e => e.name -> e).toMap
      val liveDsn = o.database.filter(graft.sinks.PgLive.reachable)
      res.expire.foreach { case (ename, tiles) =>
        val eo = outputs(ename)
        eo.filename.foreach { f =>
          val dest = out.resolve(f) // relative names land in --output-dir
          val w = java.nio.file.Files.newBufferedWriter(dest,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
          try {
            val it = graft.operators.Expire.formatTiles(tiles)
              .orderBy("tile").toLocalIterator()
            var n = 0L
            while (it.hasNext && n < eo.maxTilesOverall) {
              w.write(it.next().getString(0)); w.write("\n"); n += 1
            }
            if (it.hasNext) System.err.println(
              s"[graft] Overall tile limit ${eo.maxTilesOverall} " +
                s"reached for expire output '$ename'!")
          } finally w.close()
        }
        eo.table.foreach { tbl =>
          liveDsn match {
            case Some(dsn) =>
              val qn = s""""${eo.schema}"."$tbl""""
              graft.sinks.PgLive.execOrThrow(dsn,
                s"CREATE TABLE IF NOT EXISTS $qn (" +
                  " zoom int4 NOT NULL, x int4 NOT NULL, y int4 NOT NULL," +
                  " first timestamp with time zone DEFAULT CURRENT_TIMESTAMP(0)," +
                  " last timestamp with time zone DEFAULT CURRENT_TIMESTAMP(0)," +
                  " PRIMARY KEY (zoom, x, y));")
              import scala.jdk.CollectionConverters._
              val lines = tiles
                .selectExpr("concat_ws('\t', zoom, x, y) AS l")
                .orderBy("l").limit(math.min(eo.maxTilesOverall,
                  Int.MaxValue.toLong).toInt)
                .toLocalIterator().asScala.map(_.getString(0) + "\n")
              graft.sinks.PgLive.session(dsn,
                Iterator("BEGIN;\n",
                  "CREATE TEMP TABLE __graft_exp (zoom int4, x int4," +
                    " y int4) ON COMMIT DROP;\n",
                  "COPY __graft_exp FROM STDIN;\n") ++
                  lines ++
                  Iterator("\\.\n",
                    s"INSERT INTO $qn (zoom, x, y) SELECT zoom, x, y" +
                      " FROM __graft_exp ON CONFLICT (zoom, x, y)" +
                      " DO UPDATE SET last = CURRENT_TIMESTAMP(0);\n",
                    "COMMIT;\n"))
            case None =>
              tiles.write.mode("overwrite").parquet(s"$out/expire_$ename")
          }
        }
      }
    }
    // live flex load: the flex-output lifecycle per table
    // (src/output-flex.cpp start/stop), from the landed parquet
    o.database.foreach { dsn =>
      java.nio.file.Files.writeString(out.resolve("jdbc_url.txt"),
        graft.sinks.PgSink.jdbcUrlFromDsn(dsn) + "\n")
      if (graft.sinks.PgLive.reachable(dsn)) {
        import scala.jdk.CollectionConverters._
        val needHstore = cfg.tables.exists(
          _.columns.exists(_.ctype == graft.flex.FlexType.Hstore))
        val postgis =
          graft.sinks.ClassicPgLoad.prepareServer(dsn, needHstore)
        cfg.tables.foreach { t =>
          // a table's own schema field wins over the CLI --schema
          // (define_table{schema=...}, with-schema.lua)
          val ts = t.schemaName.getOrElse(o.tableSchema)
          if (t.schemaName.isDefined) graft.sinks.PgLive.execOrThrow(dsn,
            s"""CREATE SCHEMA IF NOT EXISTS "$ts";""")
          val q = s""""$ts"."${t.name}""""
          graft.sinks.PgLive.execOrThrow(dsn,
            s"DROP TABLE IF EXISTS $q;")
          graft.sinks.PgLive.execOrThrow(dsn,
            graft.sinks.PgSink.createTableDdl(t, unlogged = true,
              ts, postgis) + ";")
          // a declared table nothing inserted into (e.g. a gen dest
          // table when process_gen didn't run) exists but stays empty
          if (new java.io.File(s"$out/${t.name}").exists())
            graft.sinks.PgLive.copyInto(dsn, q,
              graft.sinks.PgSink.copyLines(
                spark.read.parquet(s"$out/${t.name}"), t, postgis)
                .toLocalIterator().asScala)
          graft.sinks.PgSink.postLoadDdl(t, updatable = o.slim && !o.drop,
            ts, postgis)
            .foreach(d => graft.sinks.PgLive.execOrThrow(dsn, d + ";"))
        }
      }
    }
  }

  /** Resolve a FlexConfig: a `.lua` path runs through the embedded
    * Lua runtime ([[graft.flex.LuaFlexConfig]] — the reference's
    * native config surface, osm2pgsql-manual `-S config.lua`);
    * anything else is a fully-qualified compiled Scala `object`
    * (companion MODULE$) or zero-arg class (the typed DSL). */
  /** osm2pgsql.properties visible to Lua configs (the properties_t
    * entries output_flex_t::init_lua pushes; lua-basics.feature
    * checks attributes/prefix). */
  private def luaPropertiesOf(o: Options): Map[String, String] = Map(
    "attributes" -> o.extraAttributes.toString,
    "prefix" -> o.prefix,
    "output" -> o.output,
    "updatable" -> o.slim.toString,
    "db_format" -> (if (o.slim) "1" else "0"),
    "version" -> "2.3.0")

  private def loadFlexConfig(name: String, append: Boolean = false,
      database: Option[String] = None,
      luaProperties: Map[String, String] = Map.empty)
      : graft.flex.FlexConfig =
    if (name.endsWith(".lua")) {
      if (!new java.io.File(name).exists())
        Options.fail(s"Error loading lua config: file '$name' not found.")
      // define_locator's add_from_db queries run against -d when the
      // server is reachable (psql -At rows: name|hex-ewkb)
      val resolver = database.filter(graft.sinks.PgLive.reachable)
        .map { dsn => (sql: String) =>
          graft.sinks.PgLive.execOrThrow(dsn, sql + ";")
            .linesIterator.filter(_.contains("|")).map { line =>
              val i = line.indexOf('|')
              val hex = line.substring(i + 1).stripPrefix("\\x")
              line.substring(0, i) -> hex.grouped(2)
                .map(Integer.parseInt(_, 16).toByte).toArray
            }.toSeq
        }
      try graft.flex.LuaFlexConfig.fromFile(name,
        mode = if (append) "append" else "create",
        dbRegionResolver = resolver,
        properties = luaProperties)
      catch {
        case e: Exception => Options.fail(
          s"Error loading lua config: ${e.getMessage}.")
      }
    } else try {
      val cls =
        try Class.forName(name + "$")
        catch { case _: ClassNotFoundException => Class.forName(name) }
      if (cls.getName.endsWith("$"))
        cls.getField("MODULE$").get(null).asInstanceOf[graft.flex.FlexConfig]
      else cls.getDeclaredConstructor().newInstance()
        .asInstanceOf[graft.flex.FlexConfig]
    } catch {
      case _: ClassNotFoundException => Options.fail(
        s"Flex config '$name' not found: -S must name a compiled " +
          "graft.flex.FlexConfig object (e.g. " +
          "graft.flex.examples.PoisAndHighways) or a .lua config file.")
    }
}
