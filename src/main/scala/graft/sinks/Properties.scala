package graft.sinks

import org.apache.spark.sql.SparkSession

/** The osm2pgsql_properties store (reference: src/properties.cpp:22):
  * a small key-value table persisting import settings (attributes,
  * prefix, updatable, output, replication base/seq —
  * src/osm2pgsql.cpp:102-145), validated against options on append
  * (src/osm2pgsql.cpp:300-309). Here: a JSON state file next to the
  * output dataset.
  */
object Properties {

  def save(spark: SparkSession, path: String,
      props: Map[String, String]): Unit = {
    import spark.implicits._
    props.toSeq.toDF("property", "value")
      .coalesce(1).write.mode("overwrite").json(path)
  }

  def load(spark: SparkSession, path: String): Map[String, String] = {
    import spark.implicits._
    spark.read.json(path).select("property", "value")
      .as[(String, String)].collect().toMap
  }

  /** The import-time property set the reference persists
    * (src/osm2pgsql.cpp:102-145 store_properties + store_data_properties):
    * fixed settings plus, when the input carries timestamps, the max
    * entity timestamp as import_timestamp AND current_timestamp —
    * regression/timestamps.feature pins exactly this shape (10 rows
    * with timestamps, 8 without). The timestamp scan is one max()
    * aggregate over the unioned entity frames. */
  def importProperties(osm: graft.sources.OsmXml.OsmDataFrames,
      attributes: Boolean = false, prefix: String = "planet_osm",
      updatable: Boolean = false, output: String = "pgsql",
      style: String = "default.style", engineVersion: String = "graft",
      flatNodeFile: String = ""): Map[String, String] = {
    import org.apache.spark.sql.functions._
    val tsRow = osm.nodes.select(col("timestamp"))
      .unionAll(osm.ways.select(col("timestamp")))
      .unionAll(osm.relations.select(col("timestamp")))
      .agg(max(col("timestamp"))).head()
    val ts = if (tsRow.isNullAt(0)) 0L else tsRow.getLong(0) // empty input
    val base = Map(
      "attributes" -> attributes.toString,
      "db_format" -> "0",
      "flat_node_file" -> flatNodeFile,
      "prefix" -> prefix,
      "updatable" -> updatable.toString,
      "version" -> engineVersion,
      "output" -> output,
      "style" -> style)
    if (ts <= 0) base
    else {
      val iso = java.time.Instant.ofEpochSecond(ts).toString
      base + ("import_timestamp" -> iso) + ("current_timestamp" -> iso)
    }
  }

  /** Append-time property update (src/osm2pgsql.cpp:364-374 bumps the
    * replication/current timestamp after a diff): current_timestamp
    * advances to the change set's max timestamp (never backwards),
    * import_timestamp stays — giving timestamps.feature's
    * current-without-import shape when the import had no timestamps. */
  def appendProperties(stored: Map[String, String],
      changes: graft.sources.OsmXml.OsmDataFrames): Map[String, String] = {
    import org.apache.spark.sql.functions._
    val tsRow = changes.nodes.select(col("timestamp"))
      .unionAll(changes.ways.select(col("timestamp")))
      .unionAll(changes.relations.select(col("timestamp")))
      .agg(max(col("timestamp"))).head()
    val ts = if (tsRow.isNullAt(0)) 0L else tsRow.getLong(0)
    if (ts <= 0) stored
    else {
      val prev = stored.get("current_timestamp")
        .map(java.time.Instant.parse(_).getEpochSecond).getOrElse(0L)
      val next = math.max(prev, ts)
      stored + ("current_timestamp" ->
        java.time.Instant.ofEpochSecond(next).toString)
    }
  }

  /** Append-mode validation (src/osm2pgsql.cpp:300-309): settings that
    * must not change between the import and an append run. Returns the
    * mismatches. */
  def validateForAppend(stored: Map[String, String],
      current: Map[String, String],
      mustMatch: Seq[String] = Seq("prefix", "output", "flat_node_file",
        "attributes", "db_format")): Seq[(String, Option[String], Option[String])] =
    mustMatch.flatMap { k =>
      (stored.get(k), current.get(k)) match {
        case (a, b) if a == b => None
        case (a, b)           => Some((k, a, b))
      }
    }
}
