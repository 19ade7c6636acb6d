package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.geom.Srid

/** Typed port of flex-config/addresses.lua — one any-ids table (with
  * an osm_type column) of every object carrying more than one addr:*
  * tag; polygonal objects contribute their centroid, all in 4326. */
object Addresses extends FlexConfig {

  private val addrKeys = Seq("housenumber", "street", "city",
    "postcode", "country", "state", "place")

  private val addrs = FlexTableDef("addrs", FlexIds.AnyObject,
    Seq(FlexColumn("name", FlexType.Text)) ++
      addrKeys.reverse.map(FlexColumn(_, FlexType.Text)) :+
      FlexColumn("geom", FlexType.Point, projection = Srid.WGS84,
        notNull = true),
    typeColumn = Some("osm_type"))

  override def tables: Seq[FlexTableDef] = Seq(addrs)

  /** get_address (addresses.lua:22-35): keep objects with > 1 addr:*
    * key. */
  private def addrCount(tags: Column): Column =
    addrKeys.map(k =>
      when(tags.getItem(s"addr:$k").isNotNull, 1).otherwise(0))
      .reduce[Column](_ + _)

  private def addrCols(tags: Column): Seq[Column] =
    Seq(tags.getItem("name").as("name")) ++
      addrKeys.reverse.map(k => tags.getItem(s"addr:$k").as(k))

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("addrs" -> nodes.where(addrCount(col("tags")) > 1)
      .select(Seq(lit("N").as("osm_type"), col("id").as("osm_id")) ++
        addrCols(col("tags")) :+
        FlexGeom.asPoint(Srid.WGS84)(col("lon"), col("lat"))
          .as("geom"): _*))

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    Map("addrs" -> ways
      .where(coalesce(closed, lit(false)) && addrCount(col("tags")) > 1)
      .select(Seq(lit("W").as("osm_type"), col("id").as("osm_id")) ++
        addrCols(col("tags")) :+
        FlexGeom.wayPolygonCentroid(Srid.WGS84)(
          col("__lons"), col("__lats")).as("geom"): _*))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map("addrs" -> rels
      .where(col("tags").getItem("type") === "multipolygon" &&
        addrCount(col("tags")) > 1)
      .select(Seq(lit("R").as("osm_type"), col("id").as("osm_id")) ++
        addrCols(col("tags")) :+
        FlexGeom.mpCentroid(Srid.WGS84)(col("__mlons"), col("__mlats"))
          .as("geom"): _*))
}
