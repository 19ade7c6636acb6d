package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time ONE registered query N times in a single session
  * (first run includes codegen/file-listing warmup — read the later
  * runs). Usage:
  *   sbt "Test/runMain graft.BenchOne <queryName> <sfDir> <n>"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, n) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n.toInt).foreach { i =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
