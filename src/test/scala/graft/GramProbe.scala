package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: compare n-gram construction strategies. */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val w = split(trim(lower(col("text"))), "\\s+")

    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.select(explode(c).as("g")).groupBy("g").count()
          .where(col("count") > 1).count()
        println(f"[$tag] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs distinct_dups=$n")
      }
    }

    // current: transform(sequence) + slice per index
    val slice8 = when(size(w) >= 8,
      transform(sequence(lit(0), size(w) - 8),
        i => array_join(slice(w, i + 1, lit(8)), " ")))
      .otherwise(array().cast("array<string>"))
    // zip_with chain: shift-concat 7 times, then cut the tail
    def zipGrams(n: Int): org.apache.spark.sql.Column = {
      var acc = w
      (1 until n).foreach { k =>
        acc = zip_with(acc, slice(w, lit(k + 1), size(w)),
          (a, b) => concat(a, lit(" "), b))
      }
      when(size(w) >= n, slice(acc, lit(1), size(w) - (n - 1)))
        .otherwise(array().cast("array<string>"))
    }
    time("slice8")(slice8)
    time("zip8")(zipGrams(8))
    time("slice2")(when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => array_join(slice(w, i + 1, lit(2)), " ")))
      .otherwise(array().cast("array<string>")))
    time("zip2")(zipGrams(2))
    spark.stop()
  }
}
