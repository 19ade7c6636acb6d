package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._
import graft.sources.OsmXml.OsmDataFrames

/** Typed port of flex-config/turning-circles.lua — the id-cache
  * idiom: highway=turning_circle nodes land in their own table, and
  * for every highway way each of its nodes that is a turning circle
  * produces a (way, node, point) row so the circle can be styled
  * with its road.
  *
  * The Lua version walks object.nodes through in_id_cache() per way;
  * the Spark-first form is the same relationship as one declarative
  * exploded-refs ⨝ circles join in [[processGraph]] — no driver-side
  * cache, broadcastable small side, and it scales with the data. */
object TurningCircles extends FlexConfig {

  private val circles = FlexTableDef("turning_circles", FlexIds.Node,
    Seq(FlexColumn("geom", FlexType.Point, notNull = true)),
    idColumn = "node_id", idCache = true)

  private val highways = FlexTableDef("tc_highways", FlexIds.Way,
    Seq(
      FlexColumn("htype", FlexType.Text, notNull = true),
      FlexColumn("geom", FlexType.Linestring, notNull = true)),
    idColumn = "way_id")

  private val highwayEnds = FlexTableDef("tc_highway_ends", FlexIds.Way,
    Seq(
      FlexColumn("htype", FlexType.Text, notNull = true),
      FlexColumn("node_id", FlexType.Int8, notNull = true),
      FlexColumn("geom", FlexType.Point, notNull = true)),
    idColumn = "way_id")

  override def tables: Seq[FlexTableDef] =
    Seq(circles, highways, highwayEnds)

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("turning_circles" -> nodes
      .where(col("tags").getItem("highway") === "turning_circle")
      .select(col("id").as("node_id"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))

  override def processWays(ways: DataFrame): Map[String, DataFrame] =
    Map("tc_highways" -> ways
      .where(col("tags").getItem("highway").isNotNull)
      .select(col("id").as("way_id"),
        col("tags").getItem("highway").as("htype"),
        col("__geom").as("geom")))

  override def processGraph(osm: OsmDataFrames): Map[String, DataFrame] = {
    // in_id_cache(object.nodes) as a join: highway way refs exploded
    // against the turning-circle node set
    val circleNodes = osm.nodes
      .where(col("tags").getItem("highway") === "turning_circle")
      .select(col("id").as("cnid"), col("lon"), col("lat"))
    val hwRefs = osm.ways
      .where(col("tags").getItem("highway").isNotNull)
      .select(col("id").as("way_id"),
        col("tags").getItem("highway").as("htype"),
        explode(col("nodes")).as("ref"))
    Map("tc_highway_ends" -> hwRefs
      .join(circleNodes, col("ref") === col("cnid"))
      .select(col("way_id"), col("htype"), col("ref").as("node_id"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))
  }
}
