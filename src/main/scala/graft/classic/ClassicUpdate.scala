package graft.classic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Middle
import graft.sources.OsmXml.OsmDataFrames

/** Append mode for the classic output (reference: src/osmdata.cpp +
  * §2.8 of SURVEY.md): apply a change file, compute the dependency
  * closure, re-derive exactly the affected rows, and merge with the
  * previous table state (delete-then-insert).
  *
  * Everything is semi-joins over the updated entity sets — the
  * set-at-a-time form of the reference's pending-id queues.
  */
object ClassicUpdate {

  /** Latest-version-wins application of a change set to one entity
    * stream; deletes drop the entity (visible=false rows removed after
    * the merge, matching delete+reinsert middle semantics,
    * src/middle-pgsql.cpp). */
  def applyToStream(base: DataFrame, changes: DataFrame): DataFrame = {
    val cols = base.columns.filter(c => c != "action").toIndexedSeq
    val merged = graft.sources.Validate.mergeFiles(
      Seq(
        base.selectExpr(cols: _*).withColumn("__prio", lit(0)),
        changes.selectExpr(cols: _*).withColumn("__prio", lit(1))),
      "id", "version", "__prio").drop("__prio")
    merged.where(col("visible"))
  }

  def applyChanges(base: OsmDataFrames, ch: OsmDataFrames): OsmDataFrames =
    OsmDataFrames(
      applyToStream(base.nodes, ch.nodes),
      applyToStream(base.ways, ch.ways),
      applyToStream(base.relations, ch.relations),
      // keep both inputs' parsed-entity caches releasable through the
      // merged frames' unpersistBacking()
      backing = base.backing ++ ch.backing)

  /** The append computation's pieces, exposed for sinks that apply
    * delete-then-insert natively (the live PostgreSQL load keys
    * deletes on the id sets and inserts only `rederived`, matching
    * db_deleter_by_id_t + the re-derive queue). */
  final case class Delta(changedNodes: DataFrame, pendingWays: DataFrame,
      pendingRels: DataFrame, rederived: ClassicPipeline.Tables4)

  /** Incremental table update. Returns the updated 4 tables.
    *
    * Pipeline (src/osmdata.cpp:371-406):
    *  1. changed ids per type from the change file (incl. deletes);
    *  2. dependency closure on the UPDATED reference graph: parent
    *     ways of changed nodes; parent relations of changed nodes and
    *     of (changed ∪ pending) ways;
    *  3. re-derive rows for changed nodes / pending ways / pending
    *     relations only (resolution sees all entities);
    *  4. delete-then-insert: drop previous rows keyed by those ids
    *     (negative for relations), union the re-derived rows.
    */
  def incrementalUpdate(before: OsmDataFrames, changes: OsmDataFrames,
      prev: ClassicPipeline.Tables4, style: Style,
      srid: Int = graft.geom.Srid.WebMercator,
      hstore: Boolean = false, hstoreMatchOnly: Boolean = false,
      extraAttributes: Boolean = false,
      keepCoastlines: Boolean = false, multiGeometry: Boolean = false,
      reprojectArea: Boolean = false,
      hstoreColumns: Seq[String] = Nil): ClassicPipeline.Tables4 =
    applyDelta(prev, computeDelta(before, changes, style, srid,
      hstore, hstoreMatchOnly, extraAttributes,
      keepCoastlines, multiGeometry, reprojectArea, hstoreColumns))

  /** Steps 1-3 of [[incrementalUpdate]]: the id closures plus the
    * re-derived rows, without merging into previous tables. */
  def computeDelta(before: OsmDataFrames, changes: OsmDataFrames,
      style: Style, srid: Int = graft.geom.Srid.WebMercator,
      hstore: Boolean = false, hstoreMatchOnly: Boolean = false,
      extraAttributes: Boolean = false,
      keepCoastlines: Boolean = false, multiGeometry: Boolean = false,
      reprojectArea: Boolean = false,
      hstoreColumns: Seq[String] = Nil): Delta = {
    val after = applyChanges(before, changes)

    val changedNodes = changes.nodes.select(col("id")).distinct()
    val changedWays = changes.ways.select(col("id")).distinct()
    val changedRels = changes.relations.select(col("id")).distinct()

    val parentWays = Middle.parentsOfNodes(after.ways, "id", "nodes",
      changedNodes, "id")
    val pendingWays = changedWays
      .unionByName(parentWays.toDF("id")).distinct()
    val parentRelsN = Middle.parentsOfMembers(after.relations, "id",
      "members", "n", changedNodes, "id", typeField = "mtype")
    val parentRelsW = Middle.parentsOfMembers(after.relations, "id",
      "members", "w", pendingWays, "id", typeField = "mtype")
    val pendingRels = changedRels
      .unionByName(parentRelsN.toDF("id"))
      .unionByName(parentRelsW.toDF("id")).distinct()

    val rederived = ClassicPipeline.run(after, style, srid,
      hstore = hstore, hstoreMatchOnly = hstoreMatchOnly,
      extraAttributes = extraAttributes,
      keepCoastlines = keepCoastlines, multiGeometry = multiGeometry,
      reprojectArea = reprojectArea, hstoreColumns = hstoreColumns,
      subset = ClassicPipeline.Subset(Some(changedNodes), Some(pendingWays),
        Some(pendingRels)))
    Delta(changedNodes, pendingWays, pendingRels, rederived)
  }

  /** Step 4 of [[incrementalUpdate]]: delete-then-insert against the
    * previous table state (relations key with negative ids). */
  def applyDelta(prev: ClassicPipeline.Tables4,
      d: Delta): ClassicPipeline.Tables4 = {
    def minus(prevT: DataFrame, ids: DataFrame, negate: Boolean): DataFrame = {
      val keyed = ids.select(
        (if (negate) -col("id") else col("id")).as("__del"))
      prevT.join(keyed, col("osm_id") === col("__del"), "left_anti")
    }

    ClassicPipeline.Tables4(
      point = minus(prev.point, d.changedNodes, negate = false)
        .unionByName(d.rederived.point),
      line = minus(minus(prev.line, d.pendingWays, negate = false),
        d.pendingRels, negate = true).unionByName(d.rederived.line),
      polygon = minus(minus(prev.polygon, d.pendingWays, negate = false),
        d.pendingRels, negate = true).unionByName(d.rederived.polygon),
      roads = minus(minus(prev.roads, d.pendingWays, negate = false),
        d.pendingRels, negate = true).unionByName(d.rederived.roads))
  }
}
