package graft.flex

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.lua._
import graft.geom.{Ewkb, Geometry => GGeometry, GeomOps, NullGeom, Srid,
  Point => GPoint, LineString => GLineString, Polygon => GPolygon,
  MultiPoint => GMultiPoint, MultiLineString => GMultiLineString,
  MultiPolygon => GMultiPolygon, GeometryCollection => GCollection}

/** A [[FlexConfig]] backed by a REAL osm2pgsql Lua config file — the
  * compatibility surface that lets a reference user run their
  * existing `-O flex -S config.lua` unchanged.
  *
  * Execution model: the chunk runs once on the driver to collect the
  * table definitions (define_table, define_expire_output, process_gen
  * recording) and once per PARTITION on the executors to run the
  * per-object callbacks — the reference runs one Lua state per worker
  * thread behind a global mutex (src/output-flex.cpp
  * get_mutex_and_call_lua_function); here every partition owns an
  * independent state, so callbacks scale with cores instead of
  * serializing on one lock. Only the chunk SOURCE ships in the
  * closure; each partition re-derives the (deterministic) config.
  *
  * Inserts stream out as one homogeneous Dataset — (tableIdx, string
  * fields, EWKB fields, map fields, object type/id) — persisted once,
  * then split per table with declarative projections, so the Lua pass
  * over N output tables runs ONCE regardless of N. Two-stage configs
  * (select_relation_members) stay fully declarative: marked way ids
  * are a DataFrame; stage-1 rows for marked ways are anti-joined away
  * and the marked ways reprocess with `osm2pgsql.stage == 2`, exactly
  * the reference's reprocess_marked contract
  * (src/output-flex.cpp:1544-1618) without collecting ids.
  */
final class LuaFlexConfig(
    chunkSource: String,
    chunkName: String = "config.lua",
    mode: String = "create",
    properties: Map[String, String] = Map.empty,
    configDir: String = "",
    /** add_from_db backing (define_locator): user SQL → (name, EWKB)
      * regions. The CLI passes a live-PG resolver when `-d` is set;
      * results are recorded at driver load and shipped to executor
      * envs, so the database is queried ONCE, not per partition. */
    dbRegionResolver: Option[String => Seq[(String, Array[Byte])]] = None)
    extends FlexConfig with Serializable {

  // ---------- driver-side load ----------

  private val recordedDbRegions =
    scala.collection.mutable.Map.empty[String, Seq[(String, Array[Byte])]]

  @transient private lazy val loadEnv: FlexLuaEnv = {
    val env = new FlexLuaEnv(chunkName, mode, 1, properties, configDir)
    dbRegionResolver.foreach { res =>
      env.dbRegions = sql => {
        val rows = recordedDbRegions.getOrElseUpdate(sql, res(sql))
        rows.map { case (n, b) => (n, Ewkb.decode(b)) }
      }
    }
    env.loadSource(chunkSource)
    env
  }

  private def has(cb: String): Boolean = loadEnv.callback(cb).isDefined

  /** Table defs with the column expire references resolved. */
  override val tables: Seq[FlexTableDef] = {
    val defs = loadEnv.tableDefs.toVector
    val refs = loadEnv.expireRefs.toList
    val outs = loadEnv.expireOutputs.toVector
    defs.zipWithIndex.map { case (t, ti) =>
      val myRefs = refs.filter(_.tableIdx == ti)
      if (myRefs.isEmpty) t
      else t.copy(columns = t.columns.map { c =>
        val cRefs = myRefs.filter(_.column == c.name).map { r =>
          val m = r.mode match {
            case "boundary-only" => graft.operators.TileCover.BoundaryOnly
            case "hybrid" =>
              graft.operators.TileCover.Hybrid(r.fullAreaLimit)
            case _ => graft.operators.TileCover.FullArea
          }
          FlexExpireRef(outs(r.output), m, r.buffer, r.diffExpire)
        }
        if (cRefs.isEmpty) c else c.copy(expire = cRefs)
      })
    }
  }

  override val genSteps: Seq[FlexGenStep] = {
    // process_gen runs driver-side at load: run_gen/run_sql calls are
    // recorded as steps for GenRunner (osm2pgsql-gen's behavior of
    // executing the config's process_gen, gen/forests.lua:107-120)
    loadEnv.callback("process_gen").foreach(fn => loadEnv.I.call(fn, Nil))
    loadEnv.genSteps.toVector
  }

  private val hasTwoStage: Boolean =
    has("select_relation_members") &&
      (has("process_way") || has("process_node"))

  override def twoStage: Boolean = hasTwoStage

  // anything the executor closures need, precomputed serializable;
  // forcing loadEnv first populates recordedDbRegions
  private def spec: LuaFlexConfig.RunSpec = {
    loadEnv
    LuaFlexConfig.RunSpec(chunkSource, chunkName, mode,
      properties, configDir, recordedDbRegions.toMap)
  }

  // ---------- the full pipeline over the entity frames ----------

  /** Append-flow id-cache seed (table name → single-column "id"
    * frame of node ids currently in the table minus this change's
    * touched nodes). The reference re-initializes each cache-enabled
    * table's cache from the database at the start of the way stage on
    * append (src/output-flex.cpp:1046-1059, `SELECT id_column FROM
    * table` into an in-RAM idlist_t). Kept LAZY as a DataFrame —
    * [[processGraph]] size-gates: small caches collect+broadcast,
    * planet-scale ones (e.g. every highway node) stay distributed
    * and the probe becomes a per-object join. Set by
    * [[FlexRunner.append]] before the callbacks run. */
  @transient var appendIdCacheSeed: Map[String, DataFrame] = Map.empty

  override def processGraph(osm: graft.sources.OsmXml.OsmDataFrames)
      : Map[String, DataFrame] = {
    val spark = osm.nodes.sparkSession
    import spark.implicits._

    // after_nodes/after_ways/after_relations observe state the
    // process_* callbacks accumulated across ALL entities (the
    // reference's one output thread / one Lua state — the documented
    // cumulative-counter idiom, tests/bdd/flex/lua-callbacks.feature).
    // Only a single state honors that exactly, so below the size gate
    // the frames run through one driver-side env in id order; above
    // it the distributed per-partition path runs and after_* fire at
    // each partition end (the documented scale delta — at planet
    // scale no single state can see every object anyway).
    if (Seq("after_nodes", "after_ways", "after_relations").exists(has)) {
      val gate = spark.conf.getOption("graft.flex.sequentialAfterMax")
        .map(_.toLong).getOrElse(LuaFlexConfig.SequentialAfterMax)
      val total = osm.nodes.count() + osm.ways.count() +
        osm.relations.count()
      if (total <= gate) return processGraphSequential(osm)
    }

    var nodeInserts = LuaFlexConfig.runPass(spec, osm.nodes, "node", 1)

    // ids.cache support (table_in_id_cache, src/output-flex.cpp:
    // 846-884): the mapped ids inserted into cache-enabled node
    // tables during the node pass (plus, on append, the surviving
    // prev-table ids) feed the way/relation passes' in_id_cache
    // probes. SIZE-GATED like a broadcast-join decision:
    //  - below `idCacheBroadcastMax` ids the membership set
    //    broadcasts — the same bounded in-RAM set the reference
    //    keeps, shipped once per executor instead of per thread;
    //  - above it (planet scale: a cache of every highway node is
    //    O(1e8) longs — a multi-GB driver collect) the ids stay
    //    distributed and each way/relation is enriched with the
    //    intersection of ITS OWN refs and the cache via an exploded
    //    equi-join; in_id_cache answers from that per-object set.
    //    The reference's only probe shape is the current object's
    //    refs (turning-circles.lua:59 `in_id_cache(object.nodes)`);
    //    above-gate probes of unrelated ids answer miss, documented.
    val idCacheTables = tables.zipWithIndex.collect {
      case (t, i) if t.idCache => i
    }.toSet
    var waysIn = osm.ways
    var relsIn = osm.relations
    var cacheB: Option[org.apache.spark.broadcast.Broadcast[
      Map[Int, Set[Long]]]] = None
    var cacheCols: Set[Int] = Set.empty
    if (idCacheTables.nonEmpty) {
      nodeInserts = nodeInserts.persist(StorageLevel.MEMORY_AND_DISK)
      val idsByTable: Map[Int, DataFrame] = tables.zipWithIndex.collect {
        case (t, i) if t.idCache =>
          val fresh = nodeInserts.filter(_.tbl == i).map(_.oid).toDF("id")
          i -> appendIdCacheSeed.get(t.name)
            .map(_.toDF("id").union(fresh)).getOrElse(fresh)
            .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      }.toMap
      val gate = spark.conf.getOption("graft.flex.idCacheBroadcastMax")
        .map(_.toLong).getOrElse(LuaFlexConfig.IdCacheBroadcastMax)
      val totalIds = idsByTable.values.map(_.count()).sum
      if (totalIds <= gate) {
        val byIdx = idsByTable.map { case (i, df) =>
          i -> df.collect().map(_.getLong(0)).toSet
        }
        cacheB = Some(spark.sparkContext.broadcast(byIdx))
      } else {
        waysIn = LuaFlexConfig.withCacheHits(osm.ways,
          col("nodes"), idsByTable)
        relsIn = LuaFlexConfig.withCacheHits(osm.relations,
          transform(filter(col("members"),
            m => m.getField("mtype") === "n"), m => m.getField("ref")),
          idsByTable)
        cacheCols = idsByTable.keySet
      }
    }

    val wayInserts1 = LuaFlexConfig.runPass(spec, waysIn, "way", 1,
      cache = cacheB, cacheCols = cacheCols)
    val relInserts0 = LuaFlexConfig.runPass(spec, relsIn,
      "relation", 1, cache = cacheB, cacheCols = cacheCols)

    val inserts: Dataset[LuaInsert] =
      if (!hasTwoStage) nodeInserts.union(wayInserts1).union(relInserts0)
      else {
        // relation pass emits marks as pseudo-tables -1 (ways) and
        // -2 (nodes); bounded by relation membership → broadcast
        val relPersisted = relInserts0
          .persist(StorageLevel.MEMORY_AND_DISK)
        val markedWays = relPersisted.filter(_.tbl == -1)
          .map(_.oid).distinct().toDF("mid")
        val markedNodes = relPersisted.filter(_.tbl == -2)
          .map(_.oid).distinct().toDF("mid")
        // Stage-2 state: the reference keeps ONE Lua state, so
        // globals written by process_relation in stage 1 are visible
        // when marked ways reprocess (reprocess_marked,
        // src/output-flex.cpp:1544-1618 — the documented two-stage
        // pattern stores per-way info in a Lua table). Distributed
        // analog: every stage-2 partition REPLAYS the relations
        // (inserts disabled, the m_disable_insert mechanism) to
        // rebuild that state, then flips osm2pgsql.stage to 2.
        // Member tags/ids ship in the replay; coordinate enrichment
        // does not (geometry-from-state is not a two-stage idiom).
        //
        // The replay set is BOUNDED BY THE MARKS, not by |relations|:
        // a marked way/node reads only stage-1 state keyed by its own
        // id (the documented two-stage pattern stores per-member info,
        // osm2pgsql-manual "two-stage processing"), so only relations
        // whose member list intersects the marked sets need replaying.
        // Semi-join on exploded member refs BEFORE the driver collect
        // keeps the broadcast at O(marks × fan-in) — planet-scale
        // two-stage configs no longer collect ~12M relations.
        val markedRefs = markedWays.select(col("mid"), lit("w").as("mt"))
          .union(markedNodes.select(col("mid"), lit("n").as("mt")))
        val touchedRelIds = osm.relations
          .select(osm.relations("id").as("rid"),
            explode(col("members")).as("m"))
          .join(broadcast(markedRefs),
            col("m.ref") === col("mid") && col("m.mtype") === col("mt"),
            "left_semi")
          .select("rid").distinct()
        val relsNeeded = osm.relations.join(broadcast(touchedRelIds),
          osm.relations("id") === col("rid"), "left_semi")
        val relObjs = spark.sparkContext.broadcast(
          LuaFlexConfig.collectRelationObjects(relsNeeded))
        // marked ways are a small subset — compact them into few
        // partitions so the per-partition relation replay cost stays
        // bounded by marks, not by the input partitioning
        val ways2in = waysIn.join(broadcast(markedWays),
          waysIn("id") === col("mid"), "left_semi")
          .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
        val nodes2in = osm.nodes.join(broadcast(markedNodes),
          osm.nodes("id") === col("mid"), "left_semi")
          .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
        val wayInserts2 = LuaFlexConfig.runPass(spec, ways2in, "way", 2,
          replayRels = Some(relObjs), cache = cacheB, cacheCols = cacheCols)
        val nodeInserts2 = LuaFlexConfig.runPass(spec, nodes2in, "node", 2,
          replayRels = Some(relObjs), cache = cacheB)
        val way1Kept = wayInserts1.join(broadcast(markedWays),
          wayInserts1("oid") === col("mid") &&
            wayInserts1("otype") === "w", "left_anti").as[LuaInsert]
        val node1Kept = nodeInserts.join(broadcast(markedNodes),
          nodeInserts("oid") === col("mid") &&
            nodeInserts("otype") === "n", "left_anti").as[LuaInsert]
        node1Kept.union(way1Kept).union(nodeInserts2).union(wayInserts2)
          .union(relPersisted.filter(_.tbl >= 0))
      }

    // one Lua pass total: the homogeneous insert stream persists
    // once; each output table is a filter+projection over it
    val persisted = inserts.persist(StorageLevel.MEMORY_AND_DISK)

    // zero output tables: nothing downstream would ever act on the
    // stream, but the reference still PROCESSES every object — force
    // the pass so callback errors surface
    if (tables.isEmpty) persisted.count()

    tables.zipWithIndex.map { case (t, idx) =>
      t.name -> LuaFlexConfig.projectTable(persisted.toDF(), t, idx)
    }.toMap
  }

  /** Single-state sequential pass (gate-bounded inputs only): ONE
    * driver-side Lua env processes nodes → after_nodes → ways →
    * after_ways → relations → after_relations → stage-2 reprocess,
    * exactly the reference's output-thread sequencing
    * (src/output-flex.cpp after_nodes/after_ways/after_relations +
    * reprocess_marked:1544-1618). Same LuaInsert stream and
    * projectTable tail as the distributed path, so downstream
    * (expire, append, table projection) is identical. */
  private def processGraphSequential(
      osm: graft.sources.OsmXml.OsmDataFrames): Map[String, DataFrame] = {
    val spark = osm.nodes.sparkSession
    import spark.implicits._

    val env = new FlexLuaEnv(chunkName, mode, 1, properties, configDir)
    dbRegionResolver.foreach { res =>
      env.dbRegions = sql => recordedDbRegions
        .getOrElseUpdate(sql, res(sql))
        .map { case (n, b) => (n, Ewkb.decode(b)) }
    }
    env.loadSource(chunkSource)

    // id caches live as real mutable sets, populated as inserts land
    // in cache-enabled tables — the reference's table_in_id_cache
    // (src/output-flex.cpp:846-884) verbatim; the append seed is the
    // prev-table id list (output-flex.cpp:1046-1059)
    val cacheSets = scala.collection.mutable.Map.empty[
      Int, scala.collection.mutable.Set[Long]]
    tables.zipWithIndex.foreach { case (t, i) =>
      if (t.idCache) {
        val s = scala.collection.mutable.Set.empty[Long]
        appendIdCacheSeed.get(t.name).foreach(
          _.collect().foreach(r => s += r.getLong(0)))
        cacheSets(i) = s
      }
    }
    if (cacheSets.nonEmpty)
      env.inIdCacheSink = (ti, ids) => {
        val s = cacheSets.getOrElse(ti, scala.collection.mutable.Set.empty)
        ids.zipWithIndex.collect {
          case (id, i) if s.contains(id) => (i + 1).toLong
        }
      }

    val all = scala.collection.mutable.ArrayBuffer.empty[LuaInsert]
    env.insertSink = (idx, row) => {
      val before = all.size
      val res = LuaFlexConfig.insertRow(env, idx, row, all)
      if (cacheSets.contains(idx))
        all.view.slice(before, all.size).foreach(ins =>
          cacheSets(ins.tbl) += ins.oid)
      res
    }

    def pass(df: DataFrame, kind: String, stage: Int): Unit = {
      val schema = df.schema
      val process = env.callback(s"process_$kind")
      val processUntagged = env.callback(s"process_untagged_$kind")
      val processDeleted = env.callback(s"process_deleted_$kind")
      val selectMembers =
        if (kind == "relation" && stage == 1)
          env.callback("select_relation_members")
        else None
      if (process.isEmpty && processUntagged.isEmpty &&
          processDeleted.isEmpty && selectMembers.isEmpty) return
      val get = new LuaFlexConfig.RowReader(schema)
      val iMarksOnly = schema.fieldNames.indexOf("__marks_only")
      df.sort("id").toLocalIterator().forEachRemaining { row =>
        val obj = get.toObject(row, kind)
        val marksOnly = iMarksOnly >= 0 && !row.isNullAt(iMarksOnly) &&
          row.getBoolean(iMarksOnly)
        if (obj.deleted)
          processDeleted.foreach(fn =>
            env.callProcess(fn, obj, s"process_deleted_$kind"))
        else {
          selectMembers.foreach { fn =>
            val (ws, ns) = env.callSelectRelationMembers(fn, obj)
            ws.foreach(w => all += LuaInsert(-1, Map.empty, Map.empty,
              Map.empty, "w", w))
            ns.foreach(n => all += LuaInsert(-2, Map.empty, Map.empty,
              Map.empty, "n", n))
          }
          if (!marksOnly) {
            val cbName = if (obj.tags.nonEmpty) s"process_$kind"
              else s"process_untagged_$kind"
            val cb = if (obj.tags.nonEmpty) process else processUntagged
            cb.foreach(fn => env.callProcess(fn, obj, cbName))
          }
        }
      }
    }
    def fireAfter(kind: String): Unit =
      env.callback(s"after_${kind}s").foreach(fn => env.I.call(fn, Nil))

    pass(osm.nodes, "node", 1); fireAfter("node")
    pass(osm.ways, "way", 1); fireAfter("way")
    pass(osm.relations, "relation", 1); fireAfter("relation")

    val markedW = all.iterator.filter(_.tbl == -1).map(_.oid).toSet
    val markedN = all.iterator.filter(_.tbl == -2).map(_.oid).toSet
    if (hasTwoStage && (markedW.nonEmpty || markedN.nonEmpty)) {
      // stage-1 rows of marked objects are replaced by their stage-2
      // reprocess (delete+reinsert, reprocess_marked); after_* do NOT
      // refire — the reference fires them per input pass, not per
      // stage
      val kept = all.filterNot(ins => ins.tbl >= 0 &&
        ((ins.otype == "w" && markedW(ins.oid)) ||
          (ins.otype == "n" && markedN(ins.oid))))
      all.clear(); all ++= kept
      env.osm2pgsql.rawSet(LStr("stage"), LInt(2L))
      if (markedW.nonEmpty)
        pass(osm.ways.filter(col("id").isInCollection(markedW)), "way", 2)
      if (markedN.nonEmpty)
        pass(osm.nodes.filter(col("id").isInCollection(markedN)),
          "node", 2)
    }

    val rows = all.filter(_.tbl >= 0).toVector
    val persisted = spark.createDataset(rows)
      .persist(StorageLevel.MEMORY_AND_DISK)
    tables.zipWithIndex.map { case (t, idx) =>
      t.name -> LuaFlexConfig.projectTable(persisted.toDF(), t, idx)
    }.toMap
  }
}

object LuaFlexConfig {

  final case class RunSpec(chunkSource: String, chunkName: String,
      mode: String, properties: Map[String, String], configDir: String,
      dbRegions: Map[String, Seq[(String, Array[Byte])]] = Map.empty)

  def fromFile(path: String, mode: String = "create",
      properties: Map[String, String] = Map.empty,
      dbRegionResolver: Option[String => Seq[(String, Array[Byte])]] = None)
      : LuaFlexConfig = {
    val p = java.nio.file.Paths.get(path)
    val src = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val dir = Option(p.getParent).map(_.toString + "/").getOrElse("")
    new LuaFlexConfig(src, p.getFileName.toString, mode, properties, dir,
      dbRegionResolver)
  }

  /** Run the per-object callbacks for one entity kind over its frame:
    * one Lua state per partition, rows streamed through, inserts (and
    * stage-2 marks for relations) emitted as [[LuaInsert]].
    *
    * `replayRels` (stage-2 passes) rebuilds the reference's
    * single-state globals: the partition's env first runs
    * process_[untagged_]relation over every relation with inserts
    * DISABLED (returning nothing, like m_disable_insert), then sets
    * `osm2pgsql.stage = 2` — the exact sequencing of
    * reprocess_marked (src/output-flex.cpp:1567-1572). */
  /** Broadcast-vs-join gate for the id cache, in total cached ids.
    * 4M longs ≈ 32 MB broadcast payload — the usual broadcast-join
    * comfort zone; override per session with the
    * `graft.flex.idCacheBroadcastMax` conf (tests set 0 to force the
    * distributed path). */
  private[flex] val IdCacheBroadcastMax = 4000000L

  /** Input-size gate (total objects) for the single-state sequential
    * after_* compatibility pass; override with
    * `graft.flex.sequentialAfterMax` (0 forces distributed). */
  private[flex] val SequentialAfterMax = 1000000L

  /** Above-gate id-cache support: enrich an entity frame with one
    * `__cache_hits_<i>` column per cache table — the intersection of
    * the object's own refs (`refs`) with that table's cached ids,
    * computed as explode → equi-join → collect_set. Shuffle is
    * bounded by total refs (the way-node resolve shape, which the
    * middle already pays); no driver materialization anywhere. */
  private[flex] def withCacheHits(df: DataFrame, refs: Column,
      idsByTable: Map[Int, DataFrame]): DataFrame =
    idsByTable.foldLeft(df) { case (acc, (i, ids)) =>
      val hits = acc
        .select(col("id").as("__chit_oid"), explode(refs).as("__ref"))
        .join(ids.select(col("id").as("__cid")),
          col("__ref") === col("__cid"))
        .groupBy(col("__chit_oid"))
        .agg(collect_set(col("__ref")).as(s"__cache_hits_$i"))
      acc.join(hits, acc("id") === hits("__chit_oid"), "left")
        .drop("__chit_oid")
    }

  private[flex] def runPass(spec: RunSpec, df: DataFrame, kind: String,
      stage: Int,
      replayRels: Option[org.apache.spark.broadcast.Broadcast[
        Array[LuaOsmObject]]] = None,
      cache: Option[org.apache.spark.broadcast.Broadcast[
        Map[Int, Set[Long]]]] = None,
      cacheCols: Set[Int] = Set.empty): Dataset[LuaInsert] = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    df.mapPartitions { rows =>
      val env = new FlexLuaEnv(spec.chunkName, spec.mode, 1,
        spec.properties, spec.configDir)
      if (spec.dbRegions.nonEmpty)
        env.dbRegions = sql => spec.dbRegions.getOrElse(sql, Nil)
          .map { case (n, b) => (n, Ewkb.decode(b)) }
      env.loadSource(spec.chunkSource)
      val out = scala.collection.mutable.ArrayBuffer.empty[LuaInsert]
      cache.foreach { b =>
        env.inIdCacheSink = (ti, ids) => {
          val s = b.value.getOrElse(ti, Set.empty)
          ids.zipWithIndex.collect {
            case (id, i) if s.contains(id) => (i + 1).toLong
          }
        }
      }
      // above-gate id cache: probes answer from the current object's
      // precomputed hit set (updated per row in the loop below)
      val hitColIdx: Map[Int, Int] = cacheCols.iterator.map(ti =>
        ti -> schema.fieldNames.indexOf(s"__cache_hits_$ti")).toMap
      var currentHits: Map[Int, Set[Long]] = Map.empty
      if (cacheCols.nonEmpty)
        env.inIdCacheSink = (ti, ids) => {
          val s = currentHits.getOrElse(ti, Set.empty)
          ids.zipWithIndex.collect {
            case (id, i) if s.contains(id) => (i + 1).toLong
          }
        }
      replayRels.foreach { b =>
        env.insertSink = (_, _) => Nil // m_disable_insert analog
        val pr = env.callback("process_relation")
        val pur = env.callback("process_untagged_relation")
        b.value.foreach { o =>
          val cb = if (o.tags.nonEmpty) pr else pur
          cb.foreach(fn => env.callProcess(fn, o))
        }
      }
      if (stage != 1)
        env.osm2pgsql.rawSet(LStr("stage"), LInt(stage.toLong))
      env.insertSink = (idx, row) => insertRow(env, idx, row, out)
      val process = env.callback(s"process_$kind")
      val processUntagged = env.callback(s"process_untagged_$kind")
      val processDeleted = env.callback(s"process_deleted_$kind")
      val after = env.callback(s"after_${kind}s")
      val selectMembers =
        if (kind == "relation" && stage == 1)
          env.callback("select_relation_members")
        else None
      if (process.isEmpty && processUntagged.isEmpty &&
          processDeleted.isEmpty && selectMembers.isEmpty &&
          after.isEmpty) Iterator.empty
      else {
        val get = new RowReader(schema)
        // `__marks_only` rows (append flow): unchanged parent relations
        // of re-derived members run ONLY select_relation_members — the
        // reference's stage-1c mark regeneration (src/output-flex.cpp
        // select_relation_members for pending ways) — never the insert
        // callbacks, so their table rows stay untouched.
        val iMarksOnly = schema.fieldNames.indexOf("__marks_only")
        val main = rows.flatMap { row =>
          out.clear()
          if (cacheCols.nonEmpty)
            currentHits = hitColIdx.collect {
              case (ti, ci) if ci >= 0 && !row.isNullAt(ci) =>
                ti -> row.getSeq[Long](ci).toSet
            }
          val obj = get.toObject(row, kind)
          val marksOnly = iMarksOnly >= 0 && !row.isNullAt(iMarksOnly) &&
            row.getBoolean(iMarksOnly)
          if (obj.deleted)
            processDeleted.foreach(fn =>
              env.callProcess(fn, obj, s"process_deleted_$kind"))
          else {
            selectMembers.foreach { fn =>
              val (ways, nodes) = env.callSelectRelationMembers(fn, obj)
              ways.foreach(w => out += LuaInsert(-1, Map.empty, Map.empty,
                Map.empty, "w", w))
              nodes.foreach(n => out += LuaInsert(-2, Map.empty, Map.empty,
                Map.empty, "n", n))
            }
            if (!marksOnly) {
              val cbName = if (obj.tags.nonEmpty) s"process_$kind"
                else s"process_untagged_$kind"
              val cb = if (obj.tags.nonEmpty) process else processUntagged
              cb.foreach(fn => env.callProcess(fn, obj, cbName))
            }
          }
          out.toVector
        }
        // after_nodes/after_ways/after_relations fire once the
        // partition's stream is exhausted (the reference fires them
        // after its single stream; per-partition end is the
        // distributed analog — callbacks are state/logging hooks)
        val tail = new Iterator[LuaInsert] {
          private var pending: Iterator[LuaInsert] = null
          def hasNext: Boolean = {
            if (pending == null) {
              out.clear()
              after.foreach(fn => env.I.call(fn, Nil))
              pending = out.toVector.iterator
            }
            pending.hasNext
          }
          def next(): LuaInsert = { hasNext; pending.next() }
        }
        main ++ tail
      }
    }
  }

  /** Relations as replayable objects (tags + members + attributes;
    * no coordinate enrichment — stage-2 state builders read tags and
    * member lists). Callers pass the marked-member-bounded subset, so
    * the collect is O(marks × fan-in), never O(|relations|). */
  private[flex] def collectRelationObjects(rels: DataFrame)
      : Array[LuaOsmObject] = {
    val cols = Seq("id", "version", "timestamp", "changeset", "uid",
      "user", "tags", "members").filter(rels.columns.contains)
    val proj = rels.select(cols.map(col): _*)
    val reader = new RowReader(proj.schema)
    proj.collect().map(reader.toObject(_, "relation"))
  }

  /** Field extraction indices for one entity frame's schema. */
  private final class RowReader(schema: StructType) extends Serializable {
    private def idx(n: String): Int = schema.fieldNames.indexOf(n)
    private val iAction = idx("action")
    private val iId = idx("id")
    private val iVersion = idx("version")
    private val iTimestamp = idx("timestamp")
    private val iChangeset = idx("changeset")
    private val iUid = idx("uid")
    private val iUser = idx("user")
    private val iTags = idx("tags")
    private val iLon = idx("lon")
    private val iLat = idx("lat")
    private val iNodes = idx("nodes")
    private val iLons = idx("__lons")
    private val iLats = idx("__lats")
    private val iMembers = idx("members")
    private val iMlons = idx("__mlons")
    private val iMlats = idx("__mlats")
    private val iMnlons = idx("__mnlons")
    private val iMnlats = idx("__mnlats")

    private def optLong(r: Row, i: Int): Option[Long] =
      if (i < 0 || r.isNullAt(i)) None
      else Some(r.get(i) match {
        case l: Long => l
        case n: Int  => n.toLong
        case n: java.lang.Number => n.longValue
        case ts: java.sql.Timestamp => ts.getTime / 1000L
      })
    private def dseq(r: Row, i: Int): Seq[Double] =
      if (i < 0 || r.isNullAt(i)) null else r.getSeq[Double](i)
    private def dseq2(r: Row, i: Int): Seq[Seq[Double]] =
      if (i < 0 || r.isNullAt(i)) null
      // inner arrays surface as mutable ArraySeq — normalize both
      // levels to the immutable Seq the geometry builders expect
      else r.getSeq[scala.collection.Seq[Double]](i)
        .map(s => if (s == null) null else s.toSeq)

    def toObject(r: Row, kind: String): LuaOsmObject = LuaOsmObject(
      otype = kind,
      deleted = iAction >= 0 && !r.isNullAt(iAction) &&
        r.getString(iAction) == "delete",
      id = r.getLong(iId),
      version = optLong(r, iVersion),
      timestamp = optLong(r, iTimestamp),
      changeset = optLong(r, iChangeset),
      uid = optLong(r, iUid),
      user = if (iUser < 0 || r.isNullAt(iUser)) None
        else Some(r.getString(iUser)),
      tags = if (iTags < 0 || r.isNullAt(iTags)) Map.empty
        else r.getMap[String, String](iTags).toMap,
      lon = if (iLon < 0 || r.isNullAt(iLon)) Double.NaN
        else r.getDouble(iLon),
      lat = if (iLat < 0 || r.isNullAt(iLat)) Double.NaN
        else r.getDouble(iLat),
      nodeRefs = if (iNodes < 0 || r.isNullAt(iNodes)) Nil
        else r.getSeq[Long](iNodes),
      lons = dseq(r, iLons),
      lats = dseq(r, iLats),
      members = if (iMembers < 0 || r.isNullAt(iMembers)) Nil
        else r.getSeq[Row](iMembers).map(m =>
          (m.getString(0), m.getLong(1),
            if (m.isNullAt(2)) "" else m.getString(2))),
      mlons = dseq2(r, iMlons),
      mlats = dseq2(r, iMlats),
      mnlons = dseq(r, iMnlons),
      mnlats = dseq(r, iMnlats))
  }

  /** table:insert — convert the Lua row per the column definitions
    * (flex_write_column, src/flex-write.cpp:261-469) and buffer it.
    * Returns the reference's protocol: `true`, or on a NOT NULL
    * violation `(false, message, column, object)` with the row NOT
    * written (src/output-flex.cpp:811-838). */
  private def insertRow(env: FlexLuaEnv, idx: Int, row: LTable,
      out: scala.collection.mutable.ArrayBuffer[LuaInsert]): Seq[LV] = {
    val t = env.tableDefs(idx)
    val o = env.currentObject
    if (o == null)
      env.I.fail(0, "Insert can only be called from processing functions.")
    val strs = Map.newBuilder[String, String]
    val bins = Map.newBuilder[String, Array[Byte]]
    val maps = Map.newBuilder[String, Map[String, String]]

    // tile tables: x/y are plain int columns fed from the row
    // (src/flex-lua-table.cpp:171-175 adds them as int columns)
    if (t.ids == FlexIds.Tile) {
      Seq("x", "y").foreach { k =>
        row.rawGet(LStr(k)) match {
          case LNil => return notNullResult(env, o, k)
          case v => env.I.toInteger(v) match {
            case Some(n) => strs += k -> n.toString
            case None => env.I.fail(0,
              s"Invalid value for '$k' tile id column.")
          }
        }
      }
    }

    t.writeColumns.foreach { c =>
      val v = row.rawGet(LStr(c.name))
      val isGeom =
        FlexType.sparkType(c.ctype) == BinaryType
      // flex_write_column (src/flex-write.cpp:261-470): function-like
      // values never land, nil is always NULL, everything else
      // converts (or errors) per the COLUMN type with the reference's
      // exact acceptance rules and wording
      v match {
        case LNil =>
          if (c.notNull) return notNullResult(env, o, c.name)
        case _: LBuiltin => env.I.fail(0,
          "Can not add Lua objects of type function or thread.")
        case u: LUserdata => u.value match {
          case g: GGeometry =>
            if (!isGeom) env.I.fail(0, "Invalid type 'userdata' for " +
              s"${typeLabel(c.ctype)} column.")
            if (g.isNull) {
              if (c.notNull) return notNullResult(env, o, c.name)
            } else bins += c.name -> geomBytes(env, g, c)
          case _ => env.I.fail(0,
            s"Invalid type 'userdata' for column '${c.name}'.")
        }
        case tab: LTable => c.ctype match {
          case FlexType.Hstore =>
            // keys/values via lua_tostring: strings and numbers
            // convert, anything else is the reference's NULL-key /
            // NULL-value error (flex-write.cpp:382-409)
            maps += c.name -> tab.entries.map { case (k, hv) =>
              val ks = k match {
                case LStr(s) => s
                case _: LInt | _: LNum => env.I.tostring(k)
                case other => env.I.fail(0, "NULL key for hstore. " +
                  "Possibly this is due to an incorrect data type " +
                  s"'${other.typeName}' as key.")
              }
              val vs = hv match {
                case LStr(s) => s
                case _: LInt | _: LNum => env.I.tostring(hv)
                case other => env.I.fail(0, "NULL value for hstore. " +
                  "Possibly this is due to an incorrect data type " +
                  s"'${other.typeName}' for key '$ks'.")
              }
              ks -> vs
            }.toMap
          case FlexType.Json =>
            strs += c.name -> luaToJson(env.I, tab)
          case _ if isGeom => env.I.fail(0,
            s"Need geometry data for geometry column '${c.name}'.")
          case _ => env.I.fail(0,
            s"Invalid type 'table' for ${typeLabel(c.ctype)} column.")
        }
        case scalar =>
          if (isGeom) env.I.fail(0,
            s"Need geometry data for geometry column '${c.name}'.")
          else if (c.ctype == FlexType.Json)
            strs += c.name -> luaToJson(env.I, scalar)
          else convertScalar(env, scalar, c) match {
            case Some(text) => strs += c.name -> text
            case None =>
              if (c.notNull) return notNullResult(env, o, c.name)
          }
      }
    }
    out += LuaInsert(idx, strs.result(), bins.result(), maps.result(),
      o.otype match {
        case "node" => "n"; case "way" => "w"; case _ => "r"
      }, o.id)
    Seq(LBool(true))
  }

  private def notNullResult(env: FlexLuaEnv, o: LuaOsmObject,
      column: String): Seq[LV] =
    Seq(LBool(false), LStr("null value in not null column."),
      LStr(column), env.pushObject(o))

  /** Geometry value → the column's bytes: transform to the declared
    * projection, wrap single→multi for multi columns, reject wrong
    * types (is_compatible + wrap_multi, src/flex-write.cpp:233-257,
    * 443-457). */
  private def geomBytes(env: FlexLuaEnv, g0: GGeometry,
      c: FlexColumn): Array[Byte] = {
    val g = if (g0.srid == c.projection) g0
      else if (g0.srid == Srid.WGS84) GeomOps.transform(g0, c.projection)
      else env.I.fail(0, "Geometry data in unexpected projection.")
    val compatible = (c.ctype, g) match {
      case (FlexType.Geometry, _)                                  => true
      case (FlexType.Point, _: GPoint)                             => true
      case (FlexType.Linestring, _: GLineString)                   => true
      case (FlexType.Polygon, _: GPolygon)                         => true
      case (FlexType.Multipoint, _: GPoint | _: GMultiPoint)       => true
      case (FlexType.Multilinestring,
        _: GLineString | _: GMultiLineString)                      => true
      case (FlexType.Multipolygon, _: GPolygon | _: GMultiPolygon) => true
      case (FlexType.Geometrycollection, _: GCollection)           => true
      case _                                                       => false
    }
    if (!compatible) env.I.fail(0,
      s"Geometry data for geometry column '${c.name}' has the wrong " +
        s"type (${g.typeName}).")
    val wrapMulti = c.ctype == FlexType.Multipoint ||
      c.ctype == FlexType.Multilinestring ||
      c.ctype == FlexType.Multipolygon
    Ewkb.encode(g, ensureMulti = wrapMulti)
  }

  /** The reference's per-type label in "Invalid type '…' for <label>
    * column." messages (flex-write.cpp). */
  private def typeLabel(t: FlexType.Value): String = t match {
    case FlexType.Text            => "text"
    case FlexType.Boolean         => "boolean"
    case FlexType.Int2            => "int2"
    case FlexType.Int4            => "int4"
    case FlexType.Int8            => "int8"
    case FlexType.Real            => "real/double precision"
    case FlexType.DoublePrecision => "real/double precision"
    case FlexType.Timestamp       => "timestamp"
    case FlexType.Hstore          => "hstore"
    case FlexType.Json            => "json/jsonb"
    case FlexType.Direction       => "direction"
    case other                    => other.toString.toLowerCase
  }

  /** strtoll semantics (write_integer, flex-write.cpp:92-117): skip
    * leading whitespace, optional sign, decimal digits, NOTHING after
    * — out of range or trailing junk → NULL. */
  private def strtoll(s: String): Option[Long] = {
    val t = s.dropWhile(ch => ch == ' ' || ch == '\t' || ch == '\n' ||
      ch == '\r' || ch == '\f' || ch == 0x0b.toChar)
    if (!t.matches("[+-]?[0-9]+")) None
    else try Some(t.toLong) catch { case _: NumberFormatException => None }
  }

  /** strtod semantics (write_double, flex-write.cpp:119-135): decimal
    * or 0x-hex forms, full-string match or NULL. */
  private def strtod(s: String): Option[Double] = {
    val t = s.dropWhile(ch => ch == ' ' || ch == '\t' || ch == '\n' ||
      ch == '\r' || ch == '\f' || ch == 0x0b.toChar)
    if (t.matches(raw"[+-]?0[xX][0-9a-fA-F]+"))
      // parseLong handles both signs itself; stripping only the "0x"
      // keeps "-0x1A" → -26 (a sign multiplier here would double-negate)
      Some(java.lang.Long.parseLong(t.replaceFirst("0[xX]", ""), 16).toDouble)
    else if (t.matches(raw"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"))
      Some(t.toDouble)
    else if (t.matches(raw"(?i)[+-]?(inf(inity)?)")) // C strtod accepts these
      Some(if (t.startsWith("-")) Double.NegativeInfinity
           else Double.PositiveInfinity)
    else if (t.matches(raw"(?i)[+-]?nan")) Some(Double.NaN)
    else None
  }

  /** Scalar Lua value → normalized text carrier, with the reference's
    * EXACT per-column-type acceptance rules (flex_write_column,
    * src/flex-write.cpp:281-470): which Lua types a column takes,
    * which convert, which range-overflow to NULL, which error — e.g.
    * booleans feed int and direction columns but ERROR on text/real;
    * non-integral floats land as 0 in int columns (lua_tointeger);
    * string numbers parse with strtoll/strtod semantics. Returns
    * None for a database NULL. */
  private def convertScalar(env: FlexLuaEnv, v: LV,
      c: FlexColumn): Option[String] = {
    val I = env.I
    def bad(): Nothing = I.fail(0,
      s"Invalid type '${v.typeName}' for ${typeLabel(c.ctype)} column.")
    def epochIso(n: Long): String =
      java.time.Instant.ofEpochSecond(n).toString
    def intCol(min: Long, max: Long): Option[String] = v match {
      // lua_tointeger: non-integral floats read as 0
      case LInt(n) => Some(n).filter(x => x >= min && x <= max)
        .map(_.toString)
      case LNum(d) =>
        val n = if (d.isWhole) d.toLong else 0L
        Some(n).filter(x => x >= min && x <= max).map(_.toString)
      case LStr(s) => strtoll(s).filter(x => x >= min && x <= max)
        .map(_.toString)
      case LBool(b) => Some(if (b) "1" else "0")
      case _ => bad()
    }
    c.ctype match {
      case FlexType.Text =>
        // lua_tolstring converts strings and numbers only
        v match {
          case LStr(s) => Some(s)
          case _: LInt | _: LNum => Some(I.tostring(v))
          case _ => bad()
        }
      case FlexType.Boolean => v match {
        case LBool(b) => Some(b.toString)
        case LInt(n) => Some((n != 0).toString)
        case LNum(d) => Some((d != 0.0).toString)
        case LStr("yes") | LStr("true") | LStr("1") => Some("true")
        case LStr("no") | LStr("false") | LStr("0") => Some("false")
        case LStr(_) => None
        case _ => bad()
      }
      case FlexType.Int2 => intCol(Short.MinValue, Short.MaxValue)
      case FlexType.Int4 => intCol(Int.MinValue, Int.MaxValue)
      case FlexType.Int8 => intCol(Long.MinValue, Long.MaxValue)
      case FlexType.Real | FlexType.DoublePrecision => v match {
        case LInt(n) => Some(n.toString)
        case LNum(d) => Some(I.tostring(v))
        case LStr(s) => strtod(s).map(d =>
          if (d == d.toLong.toDouble) d.toLong.toString else d.toString)
        case _ => bad()
      }
      case FlexType.Timestamp => v match {
        case LInt(n) => Some(epochIso(n))
        case LNum(d) => Some(epochIso(if (d.isWhole) d.toLong else 0L))
        case LStr(s) => Some(s)
        case _ => bad()
      }
      case FlexType.Direction => v match {
        case LBool(b) => Some(if (b) "1" else "0")
        case LInt(n) => Some(java.lang.Long.signum(n).toString)
        case LNum(d) => Some(math.signum(d).toInt.toString)
        case LStr("yes") | LStr("1") => Some("1")
        case LStr("no") | LStr("0") => Some("0")
        case LStr("-1") => Some("-1")
        case LStr(_) => None
        case _ => bad()
      }
      // hstore takes ONLY Lua tables (flex-write.cpp:382-410)
      case FlexType.Hstore => bad()
      case _ => v match {
        case LBool(b) => Some(b.toString)
        case other => Some(I.tostring(other))
      }
    }
  }

  /** Lua value → JSON text (write_json, flex-write.cpp:140-231):
    * tables with consecutive 1..n integer keys serialize as arrays,
    * any other table as an object (string keys only); NaN/Inf numbers
    * → null (the json writer's number rule); nested tables recurse
    * with the reference's cycle check ("Loop detected in table");
    * functions and other opaque values error like write_json's
    * default branch. */
  private[flex] def luaToJson(I: LuaInterp, v: LV): String =
    luaToJson(I, v, Nil)

  private def luaToJson(I: LuaInterp, v: LV,
      stack: List[LTable]): String = v match {
    case LNil     => "null"
    case LBool(b) => b.toString
    case LInt(n)  => n.toString
    case LNum(d)  =>
      if (d.isNaN || d.isInfinite) "null"
      else if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case LStr(s)  => jsonEscape(s)
    case t: LTable =>
      if (stack.exists(_ eq t)) I.fail(0, "Loop detected in table")
      val deeper = t :: stack
      val live = t.entries.toVector
      val len = t.length
      val isArray = len > 0 && live.size == len &&
        live.forall {
          case (LInt(k), _) => k >= 1 && k <= len
          case _            => false
        }
      if (isArray)
        (1L to len).map(i => luaToJson(I, t.rawGet(LInt(i)), deeper))
          .mkString("[", ",", "]")
      else
        live.map {
          case (LStr(k), hv) =>
            jsonEscape(k) + ":" + luaToJson(I, hv, deeper)
          case (k, _) => I.fail(0,
            s"Incorrect data type '${k.typeName}' as key.")
        }.mkString("{", ",", "}")
    case other => I.fail(0,
      s"Invalid type '${other.typeName}' for json/jsonb column.")
  }

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case ch if ch < ' ' => b.append(f"\\u${ch.toInt}%04x")
      case ch   => b.append(ch)
    }
    b.append('"')
    b.toString
  }

  /** One output table = filter + projection over the homogeneous
    * insert stream. Id columns derive from otype/oid exactly like
    * flex_table_t::map_id (src/flex-table.cpp:107-129). */
  private[flex] def projectTable(inserts: DataFrame, t: FlexTableDef,
      idx: Int): DataFrame = {
    val mine = inserts.where(col("tbl") === idx)
    val idCols: Seq[Column] = t.ids match {
      case FlexIds.NoIndex => Nil
      case FlexIds.Tile => Seq(
        element_at(col("strs"), "x").cast(IntegerType).as("x"),
        element_at(col("strs"), "y").cast(IntegerType).as("y"))
      case FlexIds.AnyObject if t.typeColumn.isDefined => Seq(
        upper(col("otype")).as(t.typeColumn.get),
        col("oid").as(t.idColumn))
      case _ => Seq(t.mapId(col("otype"), col("oid")).as(t.idColumn))
    }
    val valCols: Seq[Column] = t.writeColumns.map { c =>
      (FlexType.sparkType(c.ctype) match {
        case BinaryType => element_at(col("bins"), c.name)
        case _: MapType => element_at(col("maps"), c.name)
        case _          => element_at(col("strs"), c.name)
      }).as(c.name)
    }
    mine.select(idCols ++ valCols: _*)
  }
}
