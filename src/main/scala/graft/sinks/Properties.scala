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
