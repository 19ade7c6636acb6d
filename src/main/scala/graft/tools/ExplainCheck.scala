package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan inspector: prints the physical-plan skeleton (scans, joins,
  * exchanges, codegen spans, pushed filters) for the named queries —
  * the `.explain("formatted")` review loop for shuffle/broadcast/
  * pushdown hygiene. Usage: runMain graft.tools.ExplainCheck [q ...]
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_region_revenue", "q4_semi_join",
        "q32_osm_node_parents", "q20_ann_cosine_topk")
    for (q <- names) {
      println(s"===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(plan.split("\n").filter(l =>
        l.contains("Scan") || l.contains("Join") || l.contains("Exchange") ||
          l.contains("PushedFilters") || l.contains("WholeStageCodegen"))
        .take(25).mkString("\n"))
    }
    spark.stop()
  }
}
