package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SumCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.expressions.GeomExpressions.{stAreaN, stLengthN}
    val osm = graft.sources.OsmPbf.read(spark, "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf")
    val t = graft.classic.ClassicPipeline.run(osm, graft.classic.StyleFile.defaultStyle)
    println("AREA " + t.polygon.agg(sum(stAreaN($"geom"))).as[Double].head().toLong + " vs 1247245186")
    println("WAYAREA " + t.polygon.agg(sum($"way_area".cast("double"))).as[Double].head().toLong + " vs 1247243136")
    println("LINE " + t.line.agg(sum(stLengthN($"geom"))).as[Double].head().toLong + " vs 4211350")
    println("ROADS " + t.roads.agg(sum(stLengthN($"geom"))).as[Double].head().toLong + " vs 2032023")
    spark.stop()
  }
}
