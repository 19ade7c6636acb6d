package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE registered query and dump its parquet +
  * oracle SQL, for quick single-query iteration against
  * tools/verify_local.py (which accepts an outDir holding any subset
  * of queries). Usage:
  *   sbt "Test/runMain graft.DevRun <queryName> <sfDir> <outDir>"
  */
object DevRun {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.get(name)
    sql.foreach { s =>
      def q(x: String): String = "\"" + x.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"{${q(name)}: ${q(s)}}")
    }
    spark.stop()
  }
}
