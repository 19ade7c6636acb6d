package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tag-transformation primitives (reference: src/tagtransform-c.cpp,
  * src/taginfo.cpp) as pure Column expressions over
  * `MapType(String,String)` tag columns — the style-file filter and
  * z_order computation the classic pgsql output applies to every object.
  */
object TagFunctions {

  /** Highway-class render ordering table
    * (src/tagtransform-c.cpp:28-44): class name → z offset. */
  val roadClasses: Seq[(String, Int)] = Seq(
    "proposed" -> 1, "construction" -> 2, "steps" -> 10, "cycleway" -> 10,
    "bridleway" -> 10, "footway" -> 10, "path" -> 10, "track" -> 11,
    "service" -> 15, "living_street" -> 20, "pedestrian" -> 20,
    "residential" -> 30, "unclassified" -> 30, "road" -> 30,
    "tertiary_link" -> 34, "tertiary" -> 35, "secondary_link" -> 339,
    "secondary" -> 340, "primary_link" -> 344, "primary" -> 345,
    "trunk_link" -> 349, "trunk" -> 350, "motorway_link" -> 359,
    "motorway" -> 360)

  /** z_order = 100*layer + classOffset + 100*bridge - 100*tunnel
    * + 35*railway (src/tagtransform-c.cpp:46-89), as a when/otherwise
    * chain (small lookup — constant-folded by Catalyst, no join). */
  def zOrder(tags: Column): Column = {
    val layer = coalesce(tags.getItem("layer").cast("int"), lit(0))
    val highway = tags.getItem("highway")
    val classOffset = roadClasses.foldLeft(lit(0)) { case (acc, (name, z)) =>
      when(highway === name, z).otherwise(acc)
    }
    val boolTag = (k: String) =>
      tags.getItem(k).isin("yes", "true", "1")
    val bridge = when(boolTag("bridge"), 100).otherwise(0)
    val tunnel = when(boolTag("tunnel"), -100).otherwise(0)
    val railway = when(tags.getItem("railway").isNotNull, 35).otherwise(0)
    layer * 100 + classOffset + bridge + tunnel + railway
  }

  /** "roads table" membership (src/tagtransform-c.cpp:58-87): true for
    * major road classes and railways. */
  def isRoads(tags: Column): Column = {
    val highway = tags.getItem("highway")
    val major = roadClasses.filter(_._2 >= 300).map(_._1)
    highway.isin(major: _*) || tags.getItem("railway").isNotNull ||
      (tags.getItem("boundary") <=> "administrative")
  }

  /** Style-file export filter (filter_tags,
    * src/tagtransform-c.cpp:154-221): keep an object iff at least one
    * tag key is in the export list; then decide polygon-vs-line. */
  def keepByStyle(tags: Column, exportKeys: Seq[String]): Column =
    exportKeys.map(k => tags.getItem(k).isNotNull).reduce(_ || _)

  /** Polygon-vs-line decision: any polygon-flagged key present, with the
    * `area=yes/no` override (src/tagtransform-c.cpp:180-208). */
  def isPolygon(tags: Column, polygonKeys: Seq[String]): Column = {
    val anyPoly = polygonKeys.map(k => tags.getItem(k).isNotNull)
      .reduce(_ || _)
    when(tags.getItem("area") === "no", lit(false))
      .when(tags.getItem("area").isin("yes", "true", "1"), lit(true))
      .otherwise(anyPoly)
  }

  /** Drop tags whose key is in the delete list, incl. trailing-wildcard
    * patterns ("name:*") — src/taginfo.cpp + src/wildcmp.cpp. */
  def cleanTags(tags: Column, deleteKeys: Seq[String]): Column = {
    val (wild, exact) = deleteKeys.partition(_.endsWith("*"))
    map_filter(tags, (k, _) => {
      val notExact = exact.map(k =!= _).foldLeft(lit(true))(_ && _)
      val notWild = wild.map(p => !k.startsWith(p.dropRight(1)))
        .foldLeft(lit(true))(_ && _)
      notExact && notWild
    })
  }

  /** Attribute pseudo-tags (src/osmtypes.hpp:104-111): inject
    * osm_user/osm_uid/osm_version/osm_timestamp/osm_changeset. */
  def withAttributePseudoTags(tags: Column, version: Column, ts: Column,
      changeset: Column, uid: Column, user: Column): Column =
    map_concat(tags, map(
      lit("osm_version"), version.cast("string"),
      lit("osm_timestamp"), ts.cast("string"),
      lit("osm_changeset"), changeset.cast("string"),
      lit("osm_uid"), uid.cast("string"),
      lit("osm_user"), user))
}
