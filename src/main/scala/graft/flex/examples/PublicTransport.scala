package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.sources.OsmXml.OsmDataFrames

/** Typed port of flex-config/public-transport.lua — the multi-stage
  * showcase: tags from public-transport route relations flow into
  * member stops and ways.
  *
  * The Lua version runs two stages with driver-side n2r/w2r maps and
  * select_relation_members marks; the Spark-first translation is the
  * same relationship as declarative joins in [[processGraph]]:
  *  - `stops` = nodes that are role='stop' members of a wanted route
  *    relation (exactly the stage-2 node set), joined to the
  *    aggregated parent refs/ids;
  *  - `lines` = highway/railway ways, left-joined to parent data
  *    restricted to role='' members (the stage-2 way set — members
  *    with other roles stay without rel data, like rows the second
  *    stage never rewrites).
  */
object PublicTransport extends FlexConfig {

  private val stops = FlexTableDef("pt_stops", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("rel_refs", FlexType.Text),
    FlexColumn("rel_ids", FlexType.Text,
      sqlTypeOverride = Some("int8[]")),
    FlexColumn("geom", FlexType.Point, notNull = true)))

  private val lines = FlexTableDef("pt_lines", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("rel_refs", FlexType.Text),
    FlexColumn("rel_ids", FlexType.Text,
      sqlTypeOverride = Some("int8[]")),
    FlexColumn("geom", FlexType.Linestring, notNull = true)))

  private val routes = FlexTableDef("pt_routes", FlexIds.Relation, Seq(
    FlexColumn("ref", FlexType.Text),
    FlexColumn("type", FlexType.Text),
    FlexColumn("from", FlexType.Text),
    FlexColumn("to", FlexType.Text),
    FlexColumn("tags", FlexType.Json)))

  private val stopAreas = FlexTableDef("pt_stop_areas", FlexIds.Relation,
    Seq(
      FlexColumn("tags", FlexType.Json),
      FlexColumn("radius", FlexType.Real, notNull = true),
      FlexColumn("geom", FlexType.Point, notNull = true)))

  override def tables: Seq[FlexTableDef] =
    Seq(stops, lines, routes, stopAreas)

  private val ptRoutes =
    Seq("bus", "light_rail", "subway", "tram", "trolleybus")

  private def wanted(tags: Column): Column =
    tags.getItem("type") === "route" &&
      tags.getItem("route").isin(ptRoutes: _*) &&
      tags.getItem("ref").isNotNull

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map(
      "pt_routes" -> rels.where(wanted(col("tags"))).select(
        col("id").as("osm_id"),
        col("tags").getItem("ref").as("ref"),
        col("tags").getItem("route").as("type"),
        col("tags").getItem("from").as("from"),
        col("tags").getItem("to").as("to"),
        col("tags").as("tags")),
      "pt_stop_areas" -> rels
        .where(col("tags").getItem("type") === "public_transport" &&
          col("tags").getItem("public_transport") === "stop_area")
        .select(col("id").as("osm_id"), col("tags").as("tags"),
          FlexGeom.collectionBboxDiagonal()(
            col("__mnlons"), col("__mnlats"),
            col("__mlons"), col("__mlats")).cast("float").as("radius"),
          FlexGeom.collectionCentroid()(
            col("__mnlons"), col("__mnlats"),
            col("__mlons"), col("__mlats")).as("geom")))

  override def processGraph(osm: OsmDataFrames): Map[String, DataFrame] = {
    val wantedRels = osm.relations.where(wanted(col("tags")))
      .select(col("id").as("rid"),
        col("tags").getItem("ref").as("rel_ref"),
        explode(col("members")).as("m"))
    // n2r/w2r: parent data aggregated per member id — sorted unique
    // refs joined by '·', sorted unique ids as the int8[] text form
    def relData(memb: DataFrame): DataFrame = memb
      .groupBy(col("mid"))
      .agg(
        array_join(array_sort(collect_set(col("rel_ref"))), "·")
          .as("rel_refs"),
        concat(lit("{"),
          array_join(array_sort(collect_set(col("rid"))), ","),
          lit("}")).as("rel_ids"))

    val nodeMembers = wantedRels.where(col("m.mtype") === "n")
      .select(col("rid"), col("rel_ref"), col("m.ref").as("mid"),
        col("m.role").as("role"))
    val stopIds = nodeMembers.where(col("role") === "stop")
      .select(col("mid").as("sid")).distinct()
    val stopsDf = osm.nodes
      .join(stopIds, col("id") === col("sid"))
      .join(relData(nodeMembers), col("id") === col("mid"), "left")
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        col("rel_refs"), col("rel_ids"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom"))

    val wayMembers = wantedRels.where(col("m.mtype") === "w")
      .select(col("rid"), col("rel_ref"), col("m.ref").as("mid"),
        col("m.role").as("role"))
    // only role='' members are re-processed in stage 2; other roles
    // keep their stage-1 row (no rel data)
    val stage2Ways = relData(wayMembers.where(col("role") === ""))
    val resolved = graft.operators.Middle.resolveAllWayCoords(osm)
    val lineGeom = FlexGeom.asLinestring()
    val linesDf = osm.ways
      .where(col("tags").getItem("highway").isNotNull ||
        col("tags").getItem("railway").isNotNull)
      .join(resolved, col("id") === col("rwid"), "left")
      .join(stage2Ways, col("id") === col("mid"), "left")
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        col("rel_refs"), col("rel_ids"),
        lineGeom(col("wlons"), col("wlats")).as("geom"))

    Map("pt_stops" -> stopsDf, "pt_lines" -> linesDf)
  }
}
