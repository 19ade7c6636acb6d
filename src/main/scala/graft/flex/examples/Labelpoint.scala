package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/labelpoint.lua — centroid +
  * pole_of_inaccessibility (plain and with stretch = 3) for every
  * named polygon; multipolygons are split and each piece gets its own
  * label points (labelpoint.lua:52-61). */
object Labelpoint extends FlexConfig {

  private val polygons = FlexTableDef("labelpoint_polygons",
    FlexIds.Area, Seq(
      FlexColumn("name", FlexType.Text),
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Polygon, notNull = true),
      FlexColumn("centroid", FlexType.Point, notNull = true),
      FlexColumn("poi1", FlexType.Point, notNull = true),
      FlexColumn("poi2", FlexType.Point, notNull = true)))

  override def tables: Seq[FlexTableDef] = Seq(polygons)

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    Map("labelpoint_polygons" -> ways
      .where(coalesce(closed, lit(false)) &&
        col("tags").getItem("name").isNotNull)
      .select(col("id").as("osm_id"),
        col("tags").getItem("name").as("name"),
        col("tags").as("tags"),
        FlexGeom.asPolygon()(col("__lons"), col("__lats")).as("geom"),
        FlexGeom.wayPolygonCentroid(graft.geom.Srid.WebMercator)(
          col("__lons"), col("__lats")).as("centroid"),
        FlexGeom.wayPoleOfInaccessibility()(
          col("__lons"), col("__lats")).as("poi1"),
        FlexGeom.wayPoleOfInaccessibility(stretch = 3.0)(
          col("__lons"), col("__lats")).as("poi2")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    // split the multipolygon, label each piece separately
    Map("labelpoint_polygons" -> rels
      .where(col("tags").getItem("type") === "multipolygon" &&
        col("tags").getItem("name").isNotNull)
      .withColumn("__pg", explode(FlexGeom.polygonPieces()(
        col("__mlons"), col("__mlats"))))
      .select((-col("id")).as("osm_id"),
        col("tags").getItem("name").as("name"),
        map_filter(col("tags"), (k, _) => k =!= "type").as("tags"),
        col("__pg._1").as("geom"),
        FlexGeom.pieceCentroid()(col("__pg._1")).as("centroid"),
        FlexGeom.piecePoleOfInaccessibility()(col("__pg._1")).as("poi1"),
        FlexGeom.piecePoleOfInaccessibility(3.0)(col("__pg._1"))
          .as("poi2")))
}
