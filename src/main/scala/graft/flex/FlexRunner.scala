package graft.flex

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.operators.{Expire, Progress, TileCover}
import graft.sources.OsmXml.OsmDataFrames

/** Executes a [[FlexConfig]] end to end — the analog of the flex
  * output's process loop (src/output-flex.cpp:893-1006): run the
  * per-entity callbacks, coerce every declared column (including
  * typed-geometry wrap/reprojection), enforce NOT NULL as soft errors
  * (violating rows dropped, counted via observable metrics), and
  * compute each expire output's dirty-tile set from the geometry
  * columns that reference it.
  *
  * Everything stays one declarative plan per table: coercion and
  * null-filtering are column transforms fused into the insert scan,
  * and the violation counters ride the same pass as `observe` metrics
  * (no second action). Expire covers reuse the written frames.
  */
object FlexRunner {

  final case class TableResult(
      rows: DataFrame,
      /** read AFTER an action on `rows` (observable metrics) */
      inserts: Observation)

  final case class Result(
      tables: Map[String, TableResult],
      /** expire-output name → (zoom, x, y) dirty tiles, rolled up
        * over the output's zoom range */
      expire: Map[String, DataFrame])

  def run(config: FlexConfig, osm: OsmDataFrames): Result = {
    // a config with zero tables is a WARNING in the reference
    // (output-flex.cpp:1361) — callbacks still run, so their errors
    // surface (geometry-point.feature's as_point argument checks)
    if (config.tables.isEmpty)
      System.err.println("[graft] No output tables defined!")
    else FlexConfig.validateTables(config.tables)
    val defs = config.tables.map(t => t.name -> t).toMap

    // >32767-member relations are ignored before any callback runs
    // (src/osmdata.cpp:151, input.feature)
    val rels =
      if (osm.relations.columns.contains("members"))
        graft.sources.Validate.dropOversizeRelations(osm.relations)
      else osm.relations
    val inserts: Seq[(String, DataFrame)] =
      (config.processNodes(osm.nodes).toSeq ++
        config.processWays(osm.ways).toSeq ++
        config.processRelations(rels).toSeq ++
        config.processGraph(osm.copy(relations = rels)).toSeq)
    inserts.collectFirst {
      case (name, _) if !defs.contains(name) => name
    }.foreach(name => throw new IllegalArgumentException(
      s"Insert into undefined table '$name'."))

    val tables = inserts.groupBy(_._1).map { case (name, parts) =>
      val t = defs(name)
      val unioned = parts.map(_._2).reduce(_ unionByName _)
      // declared columns only, coerced; absent columns become NULL
      // (a Lua insert without the field, flex-write.cpp:274-279);
      // NoIndex tables carry no id column at all (table-ids.feature)
      val idCols: Seq[Column] = t.idFields.map(f => col(f._1))
      val cols: Seq[Column] = idCols ++ t.writeColumns.map { c =>
        val (in, dt) =
          if (unioned.columns.contains(c.name))
            (col(c.name), Some(unioned.schema(c.name).dataType))
          else (lit(null), None)
        Coerce.coerce(in, c, dt).as(c.name)
      }
      val coerced = unioned.select(cols: _*)
      // NOT NULL soft errors: count in-pass, then drop the rows
      val (observed, obs) = Progress.insertCounts(coerced,
        t.writeColumns.filter(_.notNull).map(_.name), s"inserts_$name")
      val kept = t.writeColumns.filter(_.notNull)
        .foldLeft(observed)((df, c) => df.where(col(c.name).isNotNull))
      name -> TableResult(kept, obs)
    }

    // expire: every geometry column referencing an output dirties it
    // from the FINAL written rows; one rollup per output
    val expireRefs: Seq[(FlexExpireOutput, DataFrame, FlexExpireRef)] =
      config.tables.flatMap { t =>
        t.columns.flatMap(c => c.expire.flatMap(ref =>
          tables.get(t.name).map(tr =>
            (ref.output, tr.rows.select(col(c.name).as("geom")), ref))))
      }
    val expire = expireRefs.groupBy(_._1.name).map { case (name, refs) =>
      val out = refs.head._1
      val tiles = refs.map { case (_, geoms, ref) =>
        TileCover.geometryCoverCapped(geoms, col("geom"),
          TileCover.Config(out.maxzoom, ref.mode, ref.buffer),
          out.maxTilesPerGeometry)
      }.reduce(_ unionByName _).distinct()
      name -> Expire.rollup(tiles, "x", "y", out.maxzoom, out.minzoom)
    }

    Result(tables, expire)
  }
}
