package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc tag-inventory probe used to pin test goldens (counts of
  * tag-filtered entities in a fixture extract). */
object TagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osm = graft.sources.OsmSource.read(spark, Seq(args(0)))
    val routes = osm.relations
      .where(col("tags").getItem("type") === "route" &&
        col("tags").getItem("route").isNotNull)
    println(s"routes=${routes.count()}")
    println(s"routes_null_name=${routes.where(col("tags").getItem("name").isNull).count()}")
    routes.groupBy(col("tags").getItem("route").as("k"))
      .count().orderBy(desc("count")).show(30, false)
    spark.stop()
  }
}
