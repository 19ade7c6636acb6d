package graft

import org.apache.spark.sql.functions._

import graft.operators.Par

/** The scale-adaptive fan-out's contract (round-15 optimization):
  * it widens ONLY an under-partitioned shuffle-free frame, and is the
  * identity everywhere else — the property that makes it free at real
  * scale and safe to compose (no AQE stage materialization at
  * query-construction time, no effect on streaming plans). */
class ParSpec extends SparkSpecBase {

  private val target = spark.sparkContext.defaultParallelism

  test("one-split scan-shaped frame fans out to default parallelism") {
    val tiny = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .select(col("id"), (col("id") * 2).as("v"))
    val fanned = Par.fanOut(tiny)
    assert(fanned.rdd.getNumPartitions == target,
      s"expected $target partitions after fan-out")
    // same rows, only the placement changed
    assert(fanned.select(sum(col("v"))).head().getLong(0) ==
      tiny.select(sum(col("v"))).head().getLong(0))
  }

  test("a frame already at or above the target is returned untouched") {
    val wide = spark.range(0, 100, 1, numPartitions = target + 3).toDF("id")
    val out = Par.fanOut(wide)
    assert(out eq wide, "must be the identity, not a re-plan")
  }

  test("a post-shuffle frame is returned untouched without probing") {
    // groupBy puts an Exchange in the plan; fanOut must not add a
    // repartition above it (downstream is already shuffle-partitioned)
    val agg = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .groupBy(col("id") % 7).count()
    assert(Par.fanOut(agg) eq agg)
  }

  test("a broadcast-join frame is returned untouched without probing") {
    val big = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    val dim = spark.range(0, 10, 1, numPartitions = 1).toDF("id")
    val joined = big.join(broadcast(dim), "id")
    assert(Par.fanOut(joined) eq joined)
  }

  test("a cached frame is returned untouched without probing") {
    // the exchange-inducing operators live INSIDE the InMemoryRelation
    // where the logical-plan match cannot see them; probing with
    // df.rdd would materialize the (possibly unfilled) cache at
    // query-construction time (the q76 shape — round-16)
    val cached = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .withColumn("k", col("id") % 7)
      .groupBy("k").count()
      .persist()
    try {
      val projected = cached.select(col("k"))
      assert(Par.fanOut(projected) eq projected)
    } finally { cached.unpersist(); () }
  }

  test("a streaming frame is returned untouched") {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
    assert(Par.fanOut(stream) eq stream)
  }

  test("pushed filters survive below the fan-out exchange") {
    // the q13-shaped check: a scan filter written before the fan must
    // still reach the parquet scan (pushdown traverses Repartition)
    val dir = graft.tools.Scratch.dir("parspec") // removed at JVM exit
    spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .write.mode("overwrite").parquet(dir)
    val fanned = Par.fanOut(
      spark.read.parquet(dir).where(col("id") > 500))
    val plan = fanned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PushedFilters: \\[[^\\]]*GreaterThan".r.findFirstIn(plan)
      .isDefined, s"filter must push to the scan:\n$plan")
    assert(fanned.count() == 499)
  }
}
