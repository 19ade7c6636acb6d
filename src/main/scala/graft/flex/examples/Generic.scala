package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of the reference's flex-config/generic.lua — the
  * recommended real-world starting config: data split by geometry
  * type, all surviving tags in one jsonb column, "useless" mapper/
  * import keys deleted up front (generic.lua:40-166), and the
  * closed-way area heuristic (generic.lua:183-218).
  *
  * Loaded by tests/test-output-flex-example-configs.cpp over the
  * Liechtenstein extract; CliSpec pins the table counts.
  */
object Generic extends FlexConfig {

  private val srid = 3857

  private val points = FlexTableDef("generic_points", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point, notNull = true)))

  private val lines = FlexTableDef("generic_lines", FlexIds.Way, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Linestring, notNull = true)))

  private val polygons = FlexTableDef("generic_polygons", FlexIds.Area, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Geometry, notNull = true)))

  private val routes = FlexTableDef("generic_routes", FlexIds.Relation, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Multilinestring, notNull = true)))

  private val boundaries = FlexTableDef("generic_boundaries",
    FlexIds.Relation, Seq(
      FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Multilinestring, notNull = true)))

  override def tables: Seq[FlexTableDef] =
    Seq(points, lines, polygons, routes, boundaries)

  /** generic.lua's delete_keys: plain keys and '*'-suffixed prefixes
    * (osm2pgsql.make_clean_tags_func). */
  private val deleteExact: Seq[String] = Seq(
    "attribution", "comment", "created_by", "fixme", "note", "odbl",
    "odbl:note", "source", "source_ref", "project:eurosha_2012",
    "ref:UrbIS", "accuracy:meters", "sub_sea:type", "waterway:type",
    "statscan:rbuid", "ref:ruian:addr", "ref:ruian",
    "building:ruian:type", "dibavod:id", "uir_adr:ADRESA_KOD",
    "gst:feat_id", "maaamet:ETAK", "ref:FR:FANTOIR",
    "3dshapes:ggmodelk", "AND_nosr_r", "OPPDATERIN", "addr:city:simc",
    "addr:street:sym_ul", "building:usage:pl", "building:use:pl",
    "teryt:simc", "raba:id", "dcgis:gis_id", "nycdoitt:bin",
    "chicago:building_id", "lojic:bgnum", "massgis:way_id",
    "at_bev:addr_date", "import", "import_uuid", "OBJTYPE",
    "SK53_bulk:load", "mml:class")
  private val deletePrefixes: Seq[String] = Seq(
    "note:", "source:", "CLC:", "geobase:", "canvec:", "osak:", "kms:",
    "ngbe:", "it:fvg:", "KSJ2:", "yh:", "LINZ2OSM:", "linz2osm:",
    "LINZ:", "ref:linz:", "WroclawGIS:", "naptan:", "tiger:", "gnis:",
    "NHD:", "nhd:", "mvdgis:", "lacounty:")

  /** clean_tags as one map_filter Column (stays in codegen). */
  private def cleanTags(tags: Column): Column =
    map_filter(tags, (k, _) =>
      !k.isin(deleteExact: _*) &&
        !deletePrefixes.map(p => k.startsWith(p))
          .reduce[Column](_ || _))

  /** has_area_tags (generic.lua:183-218): area=yes forces polygon,
    * area=no forces line, else any of the area-ish keys. */
  private val areaKeys: Seq[String] = Seq(
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway", "building:part")
  private def hasAreaTags(tags: Column): Column =
    when(tags.getItem("area") === "yes", lit(true))
      .when(tags.getItem("area") === "no", lit(false))
      // one set-overlap, not an Or-chain (constraint-propagation cost)
      .otherwise(arrays_overlap(map_keys(tags),
        array(areaKeys.map(lit): _*)))

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
    val cleaned = nodes.withColumn("__t", cleanTags(col("tags")))
      .where(size(col("__t")) > 0)
    Map("generic_points" -> cleaned.select(
      col("id").as("osm_id"),
      col("__t").as("tags"),
      FlexGeom.asPoint(srid)(col("lon"), col("lat")).as("geom")))
  }

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val cleaned = ways.withColumn("__t", cleanTags(col("tags")))
      .where(size(col("__t")) > 0)
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    Map(
      "generic_polygons" -> cleaned
        .where(closed && hasAreaTags(col("__t")))
        .select(col("id").as("osm_id"), col("__t").as("tags"),
          FlexGeom.asPolygon(srid)(col("__lons"), col("__lats"))
            .as("geom")),
      "generic_lines" -> cleaned
        .where(!coalesce(closed, lit(false)) ||
          !hasAreaTags(col("__t")))
        .select(col("id").as("osm_id"), col("__t").as("tags"),
          col("__geom").as("geom")))
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    // grab_tag('type') THEN clean_tags, matching generic.lua's order
    val typed = rels
      .withColumn("__type", col("tags").getItem("type"))
      .withColumn("__t",
        cleanTags(map_filter(col("tags"), (k, _) => k =!= "type")))
      .where(size(col("__t")) > 0)
    Map(
      "generic_routes" -> typed.where(col("__type") === "route")
        .select(col("id").as("osm_id"), col("__t").as("tags"),
          FlexGeom.asMultiLinestring(srid)(
            col("__mlons"), col("__mlats")).as("geom")),
      "generic_boundaries" -> typed
        .where(col("__type") === "boundary" ||
          (col("__type") === "multipolygon" &&
            col("__t").getItem("boundary").isNotNull))
        .select(col("id").as("osm_id"), col("__t").as("tags"),
          FlexGeom.asMultiLinestring(srid, merge = true)(
            col("__mlons"), col("__mlats")).as("geom")),
      "generic_polygons" -> typed
        .where(col("__type") === "multipolygon" &&
          col("__t").getItem("boundary").isNull)
        .select((-col("id")).as("osm_id"), col("__t").as("tags"),
          FlexGeom.asMultiPolygon(srid)(
            col("__mlons"), col("__mlats")).as("geom")))
  }
}
