package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling + sequence packing invariants. */
class SamplingSpec extends SparkSpecBase {

  import spark.implicits._

  test("hash sample is deterministic and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.hashSample(df, "id", "40").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", "40").as[Long].collect().toSet
    assert(a == b) // same rows every run
    // "40"/256 = 25%: binomial bounds, wide enough to never flake
    assert(a.size > 2000 * 0.25 * 0.7 && a.size < 2000 * 0.25 * 1.3)
    // smaller threshold nests inside larger
    val c = Sampling.hashSample(df, "id", "20").as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("stratified keeps exactly n per stratum, deterministically") {
    val df = (1L to 300L).map(i => (s"s${i % 3}", i)).toDF("st", "id")
    val s1 = Sampling.stratified(df, "st", "id", 7)
      .select($"st", $"id").as[(String, Long)].collect().sorted.toSeq
    val s2 = Sampling.stratified(df, "st", "id", 7)
      .select($"st", $"id").as[(String, Long)].collect().sorted.toSeq
    assert(s1 == s2)
    assert(s1.groupBy(_._1).values.forall(_.size == 7))
  }

  test("sequence packing: contiguous offsets, correct window spans") {
    val docs = Seq(
      ("a", 1L, 100), ("a", 2L, 80), ("a", 3L, 200), ("a", 4L, 0),
      ("b", 5L, 300)).toDF("shard", "id", "n")
    val packed = Sampling.packSequences(docs, "shard", "id", "n", 128)
      .select($"id", $"start_offset", $"end_offset",
        $"first_window", $"last_window")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // shard a stream: doc1 [0,100) w0; doc2 [100,180) straddles w0/w1;
    // doc3 [180,380) w1..w2; empty doc4 dropped
    assert(packed(1L) == ((1L, 0L, 100L, 0L, 0L)))
    assert(packed(2L) == ((2L, 100L, 180L, 0L, 1L)))
    assert(packed(3L) == ((3L, 180L, 380L, 1L, 2L)))
    assert(!packed.contains(4L))
    // shard b starts its own stream at 0
    assert(packed(5L) == ((5L, 0L, 300L, 0L, 2L)))
    // contiguity within the shard: next start == previous end
    assert(packed(2L)._2 == packed(1L)._3 && packed(3L)._2 == packed(2L)._3)
  }
}
