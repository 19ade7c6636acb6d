package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/data-types.lua — column data-type
  * options: a create-only serial column (DDL-only, the database
  * fills it), direction and bool coercions, an int8[] array column
  * passed as its PG text representation, a parsed km/h maxspeed. */
object DataTypes extends FlexConfig {

  private val highwayTypes = Seq("motorway", "motorway_link", "trunk",
    "trunk_link", "primary", "primary_link", "secondary",
    "secondary_link", "tertiary", "tertiary_link", "unclassified",
    "residential", "track", "service")

  private val highways = FlexTableDef("datatypes_highways", FlexIds.Way,
    Seq(
      FlexColumn("name", FlexType.Text),
      FlexColumn("type", FlexType.Text, notNull = true),
      // serial column the database fills — DDL-only
      FlexColumn("id", FlexType.Int4, createOnly = true,
        sqlTypeOverride = Some("serial")),
      FlexColumn("oneway", FlexType.Direction),
      FlexColumn("maxspeed", FlexType.Int4),
      FlexColumn("lit", FlexType.Boolean),
      FlexColumn("tags", FlexType.Json),
      FlexColumn("nodes", FlexType.Text,
        sqlTypeOverride = Some("int8[]")),
      FlexColumn("geom", FlexType.Linestring)))

  override def tables: Seq[FlexTableDef] = Seq(highways)

  /** parse_speed (data-types.lua:68-88): plain number = km/h,
    * '<n> mph' converted, anything else NULL. */
  private def parseSpeed(v: org.apache.spark.sql.Column) = {
    val num = v.try_cast("double")
    val mph = regexp_extract(v, "^(\\d+(?:\\.\\d+)?) ?mph$", 1)
      .try_cast("double")
    when(num.isNotNull, num.cast("int"))
      .when(mph.isNotNull, floor(mph * 1.60934).cast("int"))
  }

  override def processWays(ways: DataFrame): Map[String, DataFrame] = {
    val cleaned = map_filter(col("tags"), (k, _) =>
      !k.isin("odbl", "created_by", "source", "source:ref"))
    Map("datatypes_highways" -> ways
      .withColumn("__t", cleaned)
      .where(size(col("__t")) > 0 &&
        col("__t").getItem("highway").isin(highwayTypes: _*))
      .select(col("id").as("osm_id"),
        col("__t").getItem("name").as("name"),
        col("__t").getItem("highway").as("type"),
        coalesce(col("__t").getItem("oneway"), lit("0")).as("oneway"),
        parseSpeed(col("__t").getItem("maxspeed")).as("maxspeed"),
        col("__t").getItem("lit").as("lit"),
        map_filter(col("__t"), (k, _) =>
          k =!= "highway" && k =!= "name").as("tags"),
        // PG int8[] text representation: {id,id,...}
        concat(lit("{"), concat_ws(",", col("nodes")), lit("}"))
          .as("nodes"),
        col("__geom").as("geom")))
  }
}
