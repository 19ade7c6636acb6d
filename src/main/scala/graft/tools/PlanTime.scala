package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query's wall time into analyze / optimize / physical-plan
  * / execute phases (second run reported, store builds warmed). Dev
  * tool only. Usage: tools/jrun.sh graft.tools.PlanTime q151_hamming_wide ...
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (q <- args.toSeq) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, d).count() // warm
      val (df, tBuild) = t(fn(spark, d))
      val qe = df.queryExecution
      val (_, tAna) = t(qe.analyzed)
      val (_, tOpt) = t(qe.optimizedPlan)
      val (_, tPhy) = t(qe.executedPlan)
      val (n, tExec) = t(df.count())
      println(f"$q%-34s build=$tBuild%6.3f analyze=$tAna%6.3f optimize=$tOpt%6.3f physical=$tPhy%6.3f execute=$tExec%6.3f rows=$n")
    }
    spark.stop()
  }
}
