package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.functions.TagFunctions

/** Typed port of the reference's flex-config/compatible.lua — the
  * flex configuration that reproduces the classic pgsql C-transform
  * output (same four tables, same column set, same z_order/roads
  * logic), with that file's default knobs: srid 3857, no hstore,
  * prefix planet_osm, multi_geometry false, keep_coastlines false.
  *
  * Deliberate compatible.lua-vs-classic deltas are preserved — e.g.
  * relation linestrings are NOT line_merge()d (compatible.lua:745,
  * classic merges, src/output-pgsql.cpp:285) — so this config is the
  * same cross-check of the two outputs the reference ships.
  */
object Compatible extends FlexConfig {

  private val srid = 3857
  private val maxLength = 100000.0

  /** compatible.lua:66-95 polygon_keys. */
  private val polygonKeys: Seq[String] = Seq(
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway")

  /** compatible.lua:97-170 generic_keys (objects without any are
    * dropped). */
  private val genericKeys: Seq[String] = Seq(
    "access", "addr:housename", "addr:housenumber", "addr:interpolation",
    "admin_level", "aerialway", "aeroway", "amenity", "area", "barrier",
    "bicycle", "boundary", "brand", "bridge", "building", "capital",
    "construction", "covered", "culvert", "cutting", "denomination",
    "disused", "ele", "embankment", "foot", "generation:source",
    "harbour", "highway", "historic", "hours", "intermittent",
    "junction", "landuse", "layer", "leisure", "lock", "man_made",
    "military", "motorcar", "name", "natural", "office", "oneway",
    "operator", "place", "population", "power", "power_source",
    "public_transport", "railway", "ref", "religion", "route",
    "service", "shop", "sport", "surface", "toll", "tourism",
    "tower:type", "tracktype", "tunnel", "water", "waterway", "wetland",
    "width", "wood", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway")

  /** compatible.lua:173-188 delete_keys. */
  private val deleteExact: Seq[String] = Seq(
    "attribution", "comment", "created_by", "fixme", "note", "odbl",
    "odbl:note", "source", "source_ref", "way", "way_area", "z_order")
  private val deletePrefixes: Seq[String] = Seq("note:", "source:")

  /** compatible.lua:190-254 point_columns. */
  private val pointColumns: Seq[String] = Seq(
    "access", "addr:housename", "addr:housenumber", "addr:interpolation",
    "admin_level", "aerialway", "aeroway", "amenity", "area", "barrier",
    "bicycle", "brand", "bridge", "boundary", "building", "capital",
    "construction", "covered", "culvert", "cutting", "denomination",
    "disused", "ele", "embankment", "foot", "generator:source",
    "harbour", "highway", "historic", "horse", "intermittent",
    "junction", "landuse", "layer", "leisure", "lock", "man_made",
    "military", "motorcar", "name", "natural", "office", "oneway",
    "operator", "place", "population", "power", "power_source",
    "public_transport", "railway", "ref", "religion", "route",
    "service", "shop", "sport", "surface", "toll", "tourism",
    "tower:type", "tunnel", "water", "waterway", "wetland", "width",
    "wood")

  /** compatible.lua:256-321 non_point_columns. */
  private val nonPointColumns: Seq[String] = Seq(
    "access", "addr:housename", "addr:housenumber", "addr:interpolation",
    "admin_level", "aerialway", "aeroway", "amenity", "area", "barrier",
    "bicycle", "brand", "bridge", "boundary", "building",
    "construction", "covered", "culvert", "cutting", "denomination",
    "disused", "embankment", "foot", "generator:source", "harbour",
    "highway", "historic", "horse", "intermittent", "junction",
    "landuse", "layer", "leisure", "lock", "man_made", "military",
    "motorcar", "name", "natural", "office", "oneway", "operator",
    "place", "population", "power", "power_source", "public_transport",
    "railway", "ref", "religion", "route", "service", "shop", "sport",
    "surface", "toll", "tourism", "tower:type", "tracktype", "tunnel",
    "water", "waterway", "wetland", "width", "wood")

  private def genColumns(textColumns: Seq[String], area: Boolean,
      geomType: FlexType.Value): Seq[FlexColumn] =
    textColumns.map(FlexColumn(_, FlexType.Text)) ++
      Seq(FlexColumn("z_order", FlexType.Int4)) ++
      (if (area) Seq(FlexColumn("way_area", FlexType.Real)) else Nil) ++
      Seq(FlexColumn("way", geomType, notNull = true))

  private val point = FlexTableDef("compat_point", FlexIds.Node,
    genColumns(pointColumns, area = false, FlexType.Point))
  private val line = FlexTableDef("compat_line", FlexIds.Way,
    genColumns(nonPointColumns, area = true, FlexType.Linestring))
  private val polygon = FlexTableDef("compat_polygon", FlexIds.Area,
    genColumns(nonPointColumns, area = true, FlexType.Geometry))
  private val roads = FlexTableDef("compat_roads", FlexIds.Way,
    genColumns(nonPointColumns, area = true, FlexType.Linestring))

  override def tables: Seq[FlexTableDef] =
    Seq(point, line, polygon, roads)

  private def cleanTags(tags: Column): Column =
    map_filter(tags, (k, _) =>
      !k.isin(deleteExact: _*) &&
        !deletePrefixes.map(p => k.startsWith(p))
          .reduce[Column](_ || _))

  // key-set membership as ONE arrays_overlap expression, not an
  // Or-chain: Catalyst's constraint propagation canonicalizes each
  // filter Or-chain against every aliased output column — 70 terms ×
  // 68 columns OOMs the driver during analysis, one set-overlap does
  // not (and codegens tighter too)
  private def hasGenericTag(tags: Column): Column =
    arrays_overlap(map_keys(tags),
      array(genericKeys.map(lit): _*))

  /** The area=... override accepted by compatible.lua:621-627 —
    * yes/1/true and no/0/false, else polygon_keys membership. */
  private def isPolygon(tags: Column): Column =
    when(tags.getItem("area").isin("yes", "1", "true"), lit(true))
      .when(tags.getItem("area").isin("no", "0", "false"), lit(false))
      .otherwise(arrays_overlap(map_keys(tags),
        array(polygonKeys.map(lit): _*)))

  /** Project the kept tag map onto the declared text columns. */
  private def tagCols(tags: Column, columns: Seq[String]): Seq[Column] =
    columns.map(k => tags.getItem(k).as(k))

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
    val kept = nodes.withColumn("__t", cleanTags(col("tags")))
      .where(size(col("__t")) > 0 && hasGenericTag(col("__t")))
    Map("compat_point" -> kept.select(
      Seq(col("id").as("osm_id")) ++
        tagCols(col("__t"), pointColumns) ++ Seq(
        lit(null).cast("int").as("z_order"),
        FlexGeom.asPoint(srid)(col("lon"), col("lat")).as("way")): _*))
  }

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    // coastline handling (compatible.lua:592-598 + 630-633):
    // natural=coastline forces polygon + area=yes and (with
    // keep_coastlines=false) drops the natural tag
    val coast = col("tags").getItem("natural") === "coastline"
    val cleaned0 = cleanTags(col("tags"))
    val t = ways
      .withColumn("__coast", coalesce(coast, lit(false)))
      .withColumn("__t", when(col("__coast"),
        map_filter(cleaned0, (k, _) => k =!= "natural"))
        .otherwise(cleaned0))
      .where(size(col("__t")) > 0 && hasGenericTag(col("__t")))
      .withColumn("__poly", col("__coast") || isPolygon(col("__t")))
      .withColumn("__area_tag",
        when(col("__coast"), lit("yes"))
          .otherwise(col("__t").getItem("area")))
      .withColumn("__z", TagFunctions.zOrder(col("__t")))
      .withColumn("__roads", TagFunctions.isRoads(col("__t")))
    val closed = col("__lons").isNotNull && size(col("__lons")) >= 2 &&
      element_at(col("__lons"), 1) === element_at(col("__lons"), -1) &&
      element_at(col("__lats"), 1) === element_at(col("__lats"), -1)
    def selectWith(df: DataFrame, wayArea: Column, way: Column)
        : DataFrame =
      df.select(Seq(col("id").as("osm_id")) ++
        nonPointColumns.map(k =>
          if (k == "area") col("__area_tag").as("area")
          else col("__t").getItem(k).as(k)) ++ Seq(
        col("__z").as("z_order"), wayArea.as("way_area"),
        way.as("way")): _*)

    val polys = selectWith(t.where(col("__poly") && closed),
      FlexGeom.wayPolygonArea(srid)(col("__lons"), col("__lats"))
        .cast("float"),
      FlexGeom.asPolygon(srid)(col("__lons"), col("__lats")))
    val linesBase = t
      .where(!col("__poly") || !coalesce(closed, lit(false)))
      .withColumn("__piece", explode(FlexGeom.linePieces(srid, maxLength)(
        col("__lons"), col("__lats"))))
    val lines = selectWith(linesBase, lit(null).cast("float"),
      col("__piece"))
    val roadRows = selectWith(linesBase.where(col("__roads")),
      lit(null).cast("float"), col("__piece"))
    Map("compat_polygon" -> polys, "compat_line" -> lines,
      "compat_roads" -> roadRows)
  }

  override def processRelations(rels: DataFrame): Map[String, DataFrame] = {
    val t = rels
      .withColumn("__type", col("tags").getItem("type"))
      .where(col("__type").isin("route", "multipolygon", "boundary"))
      .withColumn("__t",
        cleanTags(map_filter(col("tags"), (k, _) => k =!= "type")))
      .where(size(col("__t")) > 0 && hasGenericTag(col("__t")))
      .withColumn("__boundary", col("__type") === "boundary" ||
        (col("__type") === "multipolygon" &&
          col("__t").getItem("boundary").isNotNull))
      .withColumn("__mkpoly", col("__type") === "multipolygon" &&
        col("__t").getItem("boundary").isNull)
      .withColumn("__z", TagFunctions.zOrder(col("__t")))
      .withColumn("__roads", TagFunctions.isRoads(col("__t")))
    def selectWith(df: DataFrame, wayArea: Column, way: Column)
        : DataFrame =
      df.select(Seq((-col("id")).as("osm_id")) ++
        nonPointColumns.map(k => col("__t").getItem(k).as(k)) ++ Seq(
        col("__z").as("z_order"), wayArea.as("way_area"),
        way.as("way")): _*)
    // NOT make_polygon → line rows (NO line_merge, compatible.lua:745)
    val linesBase = t.where(!col("__mkpoly"))
      .withColumn("__piece", explode(
        FlexGeom.relLinePieces(srid, maxLength, merge = false)(
          col("__mlons"), col("__mlats"))))
    val lines = selectWith(linesBase, lit(null).cast("float"),
      col("__piece"))
    val roadRows = selectWith(linesBase.where(col("__roads")),
      lit(null).cast("float"), col("__piece"))
    // boundary/multipolygon → split polygon pieces with way_area
    val polyBase = t.where(col("__boundary") || col("__mkpoly"))
      .withColumn("__pg", explode(FlexGeom.polygonPieces(srid)(
        col("__mlons"), col("__mlats"))))
    val polys = selectWith(polyBase, col("__pg._2").cast("float"),
      col("__pg._1"))
    Map("compat_line" -> lines, "compat_roads" -> roadRows,
      "compat_polygon" -> polys)
  }
}
