package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-protocol measurement (min over N interleaved passes, count()
  * action, warmup pass) of a SUBSET of queries — the optimization
  * loop's fast before/after probe. Dev tool only.
  * Usage: tools/jrun.sh graft.tools.MiniBench q141_hamming_neardup ...
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warmup (stores, codegen, listing)
    val times = Seq.fill(passes)(names.map(q => q -> once(q))).flatten
      .groupBy(_._1).map { case (q, ts) => q -> ts.map(_._2).min }
    var tot = 0.0
    for (q <- names) { println(f"$q%-36s ${times(q)}%7.3f s"); tot += times(q) }
    println(f"TOTAL${""}%-31s $tot%7.3f s")
    spark.stop()
  }
}
