package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** A real-world flex configuration (the shape of the reference's
  * flex-config/ example Lua files, e.g. generic POI + highway
  * extraction): one point table of amenity nodes, one linestring
  * table of highway ways. Runnable from the CLI via
  * `-O flex -S graft.flex.examples.PoisAndHighways` — the typed
  * analog of `-O flex -S pois.lua`.
  *
  * Way rows arrive pre-enriched with `__geom` (the resolved,
  * reprojected linestring the CLI builds from the middle — the
  * analog of the Lua callback's `object:as_linestring()`). */
object PoisAndHighways extends FlexConfig {

  private val pois = FlexTableDef("flex_pois", FlexIds.Node, Seq(
    FlexColumn("name", FlexType.Text),
    FlexColumn("amenity", FlexType.Text, notNull = true),
    FlexColumn("geom", FlexType.Point, notNull = true)))

  /** z12 expire output feeding both sink forms (define_expire_output
    * with filename AND table, src/flex-lua-expire-output.cpp) —
    * exercised end-to-end by the CLI specs. */
  private val hwExpire = FlexExpireOutput("hw_dirty",
    filename = Some("flex_dirty_tiles.txt"),
    table = Some("flex_expire"), maxzoom = 12)

  private val highways = FlexTableDef("flex_highways", FlexIds.Way, Seq(
    FlexColumn("highway", FlexType.Text, notNull = true),
    FlexColumn("name", FlexType.Text),
    FlexColumn("geom", FlexType.Linestring, notNull = true,
      expire = Seq(FlexExpireRef(hwExpire)))))

  override def tables: Seq[FlexTableDef] = Seq(pois, highways)

  private val pointGeom = udf((lon: Double, lat: Double) =>
    graft.geom.FromOsm.createPoint(lon, lat) match {
      case _: graft.geom.NullGeom => null
      case g => graft.geom.Ewkb.encode(
        graft.geom.GeomOps.transform(g, graft.geom.Srid.WebMercator))
    })

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("flex_pois" -> nodes
      .where(col("tags").getItem("amenity").isNotNull)
      .select(col("id").as("osm_id"),
        col("tags").getItem("name").as("name"),
        col("tags").getItem("amenity").as("amenity"),
        pointGeom(col("lon"), col("lat")).as("geom")))

  override def processWays(ways: DataFrame): Map[String, DataFrame] =
    Map("flex_highways" -> ways
      .where(col("tags").getItem("highway").isNotNull)
      .select(col("id").as("osm_id"),
        col("tags").getItem("highway").as("highway"),
        col("tags").getItem("name").as("name"),
        col("__geom").as("geom")))
}
