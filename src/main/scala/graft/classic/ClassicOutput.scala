package graft.classic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TagFunctions

/** The classic pgsql output pipeline (reference: src/output-pgsql.cpp +
  * src/tagtransform-c.cpp): fixed schema derived from a style file,
  * objects routed into the four tables planet_osm_point / line /
  * polygon / roads.
  *
  * Routing (src/output-pgsql.cpp:106-122, 278-322):
  *  - nodes always → point table;
  *  - closed ways with a polygon-flagged tag (or area=yes) → polygon
  *    table (negative-id convention for relations);
  *  - other ways → line table, also roads table when the z_order logic
  *    marks them as roads;
  *  - way_area computed post-reprojection.
  *
  * Everything is Column expressions — no per-row callback — so the
  * whole transform is one Catalyst plan per output table.
  */
object ClassicOutput {

  /** style filter (filter_tags, src/tagtransform-c.cpp:154-221): drop
    * objects with no exported tag; drop delete-flagged tags. */
  def filterTags(df: DataFrame, style: Style, osmType: String): DataFrame = {
    val cleaned = TagFunctions.cleanTags(col("tags"), style.deleteKeys)
    df.withColumn("tags", cleaned)
      .where(TagFunctions.keepByStyle(col("tags"),
        style.exportKeys(osmType)))
  }

  /** One column per style tag + computed z_order. */
  def projectColumns(df: DataFrame, style: Style): DataFrame = {
    val tagCols = style.columnKeys.map(k =>
      col("tags").getItem(k).as(k.replace(":", "_")))
    df.select(Seq(col("id").as("osm_id")) ++ tagCols ++ Seq(
      TagFunctions.zOrder(col("tags")).as("z_order"),
      col("tags")): _*)
  }

  /** Point table: every exported node (nodes never become polygons,
    * default.style:42-43). */
  def pointTable(nodes: DataFrame, style: Style): DataFrame =
    projectColumns(filterTags(nodes, style, "node"), style)

  /** Polygon-vs-line decision for a way (closed + polygon-flag, with
    * area=yes/no override). `isClosed`: first ref == last ref. */
  def wayIsPolygon(style: Style): Column = {
    val closed = element_at(col("nodes"), 1) ===
      element_at(col("nodes"), size(col("nodes")))
    closed && TagFunctions.isPolygon(col("tags"), style.polygonKeys)
  }

  /** Split exported ways into (polygonRows, lineRows, roadRows). */
  def wayTables(ways: DataFrame, style: Style)
      : (DataFrame, DataFrame, DataFrame) = {
    val exported = filterTags(ways, style, "way")
      .withColumn("__poly", wayIsPolygon(style))
    val polys = projectColumns(exported.where(col("__poly")), style)
    val lines = projectColumns(exported.where(!col("__poly")), style)
    val roads = projectColumns(
      exported.where(!col("__poly") &&
        TagFunctions.isRoads(col("tags"))), style)
    (polys, lines, roads)
  }
}
