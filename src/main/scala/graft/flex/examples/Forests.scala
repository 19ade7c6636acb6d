package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of the reference's flex-config/gen/forests.lua — the
  * generalization demo: one `forests` area table fed from
  * natural=wood / landuse=forest ways and multipolygon relations
  * (with a labelpoint + area for large named forests), three
  * tile-ids destination tables, three expire outputs, and a
  * raster-union run_gen step per level (forests.lua:106-120).
  */
object Forests extends FlexConfig {

  private val genLevels: Seq[(String, Int)] =
    Seq("s" -> 7, "m" -> 8, "l" -> 10)

  private val expireOutputs: Map[String, FlexExpireOutput] =
    genLevels.map { case (level, zoom) =>
      level -> FlexExpireOutput(s"exp_$level",
        table = Some(s"exp_$level"), maxzoom = zoom)
    }.toMap

  private val forests = FlexTableDef("forests", FlexIds.Area, Seq(
    FlexColumn("name", FlexType.Text),
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Geometry, notNull = true,
      expire = genLevels.map { case (level, _) =>
        FlexExpireRef(expireOutputs(level)) }),
    FlexColumn("labelpoint", FlexType.Point),
    FlexColumn("area", FlexType.Real)))

  private val genTables: Seq[FlexTableDef] = genLevels.map {
    case (level, _) =>
      FlexTableDef(s"forests_$level", FlexIds.Tile, Seq(
        FlexColumn("geom", FlexType.Polygon, notNull = true)))
  }

  override def tables: Seq[FlexTableDef] = forests +: genTables

  /** forests.lua:68 — the label/area threshold, in output-projection
    * units (the Lua file uses 0.001 because its author tested in 4326;
    * at 3857 any real forest exceeds it, matching the Lua behavior of
    * "labels on every named forest of meaningful size"). */
  private val minimumAreaForLabel = 0.001

  private def isForest(tags: org.apache.spark.sql.Column) =
    tags.getItem("natural") === "wood" ||
      tags.getItem("landuse") === "forest"

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    val base = ways.where(coalesce(closed, lit(false)) &&
        isForest(col("tags")))
      .withColumn("__g",
        FlexGeom.asPolygon()(col("__lons"), col("__lats")))
      .withColumn("__area",
        FlexGeom.wayPolygonArea()(col("__lons"), col("__lats")))
    Map("forests" -> withLabel(base, col("id")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val base = rels.where(col("tags").getItem("type") === "multipolygon" &&
        isForest(col("tags")))
      .withColumn("__g",
        FlexGeom.asMultiPolygon()(col("__mlons"), col("__mlats")))
      .withColumn("__area",
        FlexGeom.mpArea()(col("__mlons"), col("__mlats")))
      .withColumn("__label", FlexGeom.poleOfInaccessibility()(
        col("__mlons"), col("__mlats")))
    Map("forests" -> base.select((-col("id")).as("osm_id"),
      labeled(col("tags").getItem("name")).as("name"),
      col("tags").as("tags"),
      col("__g").as("geom"),
      when(labelWanted(col("tags").getItem("name")), col("__label"))
        .as("labelpoint"),
      when(labelWanted(col("tags").getItem("name")), col("__area"))
        .cast("float").as("area")))
  }

  private def labelWanted(name: org.apache.spark.sql.Column) =
    name.isNotNull && col("__area") >= minimumAreaForLabel

  private def labeled(name: org.apache.spark.sql.Column) =
    when(labelWanted(name), name)

  /** Ways need the label point from the polygon itself; reuse the
    * single-ring pole via the multipolygon helper over one ring. */
  private def withLabel(base: DataFrame,
      id: org.apache.spark.sql.Column): DataFrame = {
    val withPole = base.withColumn("__label",
      FlexGeom.poleOfInaccessibility()(
        array(col("__lons")), array(col("__lats"))))
    withPole.select(id.as("osm_id"),
      labeled(col("tags").getItem("name")).as("name"),
      col("tags").as("tags"),
      col("__g").as("geom"),
      when(labelWanted(col("tags").getItem("name")), col("__label"))
        .as("labelpoint"),
      when(labelWanted(col("tags").getItem("name")), col("__area"))
        .cast("float").as("area"))
  }

  override def genSteps: Seq[FlexGenStep] = genLevels.map {
    case (level, zoom) =>
      FlexGenStep("raster-union", "forests", s"forests_$level",
        Map("zoom" -> zoom.toString, "geom_column" -> "geom",
          "margin" -> "0.1", "expire_list" -> s"exp_$level"))
  }
}
