package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timings for a hot query (run with
  * SPARK_GRAFT_SF_DIR). Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    time("read+count")(docs.count())
    time("read+count again")(docs.count())
    import graft.functions.TextFunctions._

    val gramsHof = docs.select($"doc_id".as("id"),
      explode(array_distinct(shingles(normToks($"text"), 2))).as("g"))
    time("q24 grams explode (HOF)")(gramsHof.count())
    val grams = docs.select($"doc_id".as("id"),
      explode(graft.expressions.VectorExpressions
        .shinglesN(normToks($"text"), 2, distinct = true)).as("g"))
    time("q24 grams explode (native)")(grams.count())
    val buckets = grams.groupBy($"g")
      .agg(collect_list($"id").as("ids")).where(size($"ids") <= 25)
    time("q24 buckets")(buckets.count())
    time("q24 full") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text").count()
    }
    time("q24 full again") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text").count()
    }
    graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text")
      .explain("formatted")
    spark.stop()
  }
}
