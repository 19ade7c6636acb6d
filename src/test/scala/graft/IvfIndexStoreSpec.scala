package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndexStore, Similarity}

/** Persisted IVF index: the stored build → partition-pruned probe
  * route must be bit-equal to the in-plan ivfTopK, and the probe must
  * actually prune (read only the probed cell directories). */
class IvfIndexStoreSpec extends SparkSpecBase {
  import spark.implicits._

  // 80 vectors, 8 dims, deterministic spread so multiple cells form
  private def vecs = (1L to 80L).map { i =>
    (i, (0 until 8).map(d =>
      math.sin(i * 0.37 + d * 1.13).toFloat).toArray.toSeq)
  }.toDF("id", "vec")

  test("probe over the stored index equals the in-plan ivfTopK") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      val corpus = vecs
      IvfIndexStore.write(corpus, path)
      val queries = corpus.where($"id" < 6)
      val stored = IvfIndexStore.probe(spark, path, queries, k = 4)
        .select($"qid", $"nid", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      val inPlan = Similarity.ivfTopK(queries, corpus, k = 4)
        .select($"qid", $"nid", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(stored == inPlan)
      assert(stored.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("the cells scan is partition-pruned to the probed cells") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      IvfIndexStore.write(vecs, path)
      val nCells = new File(s"$path/cells").listFiles()
        .count(_.getName.startsWith("cell="))
      assert(nCells > 2, s"fixture built only $nCells cells")
      // one query, nprobe=1: the physical scan must touch exactly one
      // cell partition, not the whole index
      val probe = IvfIndexStore.probe(spark, path,
        vecs.where($"id" === 1L), k = 3, nprobe = 1)
      // sparkPlan, not executedPlan: AQE wraps the adaptive plan in
      // stages that hide the scan from a plain collect
      val scans = probe.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("cells")) => s
      }
      assert(scans.nonEmpty, "no file scan over the cells store found")
      // keep only the statically-evaluable filters (the literal IN
      // from the bounded probed-cell list); Spark ALSO injects a
      // dynamic-pruning subquery for the cell join, which listFiles
      // cannot evaluate pre-execution
      val partsRead = scans.map { s =>
        val static = s.partitionFilters.filterNot(_.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .DynamicPruning]).isDefined)
        s.relation.location.listFiles(static, s.dataFilters).size
      }.sum
      assert(partsRead <= 1,
        s"probe listed $partsRead cell partitions, expected <= 1")
      assert(probe.count() > 0)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }
}
