package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/hstore.lua — all tags in hstore columns,
  * a composite (geom, tags) GiST index on each table, and the way
  * fallback geometry: as_polygon(), or as_linestring() when no valid
  * polygon builds (hstore.lua:44-53). */
object Hstore extends FlexConfig {

  private val nodes = FlexTableDef("hstore_nodes", FlexIds.Node,
    Seq(
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("geom", FlexType.Point)),
    indexes = Some(Seq(
      FlexIndex(method = "gist", columns = Seq("geom", "tags")))))

  private val ways = FlexTableDef("hstore_ways", FlexIds.Way,
    Seq(
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("geom", FlexType.Geometry)),
    indexes = Some(Seq(
      FlexIndex(method = "gist", columns = Seq("geom", "tags")))))

  override def tables: Seq[FlexTableDef] = Seq(nodes, ways)

  override def processNodes(nodes0: DataFrame): Map[String, DataFrame] =
    Map("hstore_nodes" -> nodes0.where(size(col("tags")) > 0)
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))

  override def processWays(ways0: DataFrame): Map[String, DataFrame] =
    Map("hstore_ways" -> ways0.where(size(col("tags")) > 0)
      .select(col("id").as("osm_id"), col("tags").as("tags"),
        FlexGeom.asPolygonOrLine()(col("__lons"), col("__lats"))
          .as("geom")))
}
