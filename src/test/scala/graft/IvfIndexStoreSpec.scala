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

  private def cellsDir(path: String): File = {
    val v = IvfIndexStore.currentVersion(spark, path)
      .getOrElse(fail(s"no committed version at $path"))
    new File(s"$path/v=$v/cells")
  }

  test("the cells scan is partition-pruned to the probed cells") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      IvfIndexStore.write(vecs, path)
      val nCells = cellsDir(path).listFiles()
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

  test("a hot cell writes through multiple salted tasks, probe bit-equal") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      // skewed fixture: ids 25,50,75 are the centroid sample; every
      // other vector sits on top of centroid 25's direction, so one
      // Voronoi cell receives nearly the whole corpus
      val hot = (1L to 96L).map { i =>
        val bump = if (i % 25 == 0) i.toDouble else 0.001 * i
        (i, (0 until 8).map(d =>
          (math.sin(25 * 0.37 + d * 1.13) + bump * 1e-4 * d).toFloat)
          .toArray.toSeq)
      }.toDF("id", "vec")
      // AQE's size-based coalescer re-merges sub-KB salted shards at
      // test scale (at real scale a hot cell's shards are hundreds of
      // MB and stay apart — merging tiny ones is the desired
      // behavior); disable it here to observe the salt fan-out itself
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try IvfIndexStore.write(hot, path, writeSplits = 8)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val cells = cellsDir(path).listFiles()
        .filter(_.getName.startsWith("cell="))
      val hottest = cells.maxBy(
        _.listFiles().count(_.getName.endsWith(".parquet")))
      val nFiles = hottest.listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles > 1,
        s"hot cell ${hottest.getName} wrote through one task ($nFiles file)")
      // the salt must be invisible to the reader: bit-equal to in-plan
      val queries = hot.where($"id" < 4)
      val stored = IvfIndexStore.probe(spark, path, queries, k = 4)
        .select($"qid", $"nid", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val inPlan = Similarity.ivfTopK(queries, hot, k = 4)
        .select($"qid", $"nid", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(stored == inPlan && stored.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  private def probeSet(path: String, queries: org.apache.spark.sql.DataFrame) =
    IvfIndexStore.probe(spark, path, queries, k = 3)
      .select($"qid", $"nid", $"cos", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("interrupted write before the marker leaves the old index serving") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      val a = vecs
      val b = vecs.withColumn("vec",
        org.apache.spark.sql.functions.transform($"vec", x => -x))
      IvfIndexStore.write(a, path)
      val queries = a.where($"id" < 4)
      val before = probeSet(path, queries)
      intercept[RuntimeException] {
        IvfIndexStore.writeWithFailpoint(b, path, 25, 256, 8, failpoint = 1)
      }
      // torn version invisible: probe equals the old complete index
      assert(probeSet(path, queries) == before)
      // the next write garbage-collects the torn version and commits
      IvfIndexStore.write(b, path)
      assert(probeSet(path, queries) ==
        Similarity.ivfTopK(queries, b, k = 3)
          .select($"qid", $"nid", $"cos", $"rank")
          .as[(Long, Long, Double, Int)].collect().toSet)
      assert(IvfIndexStore.currentVersion(spark, path).nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("interrupted write after the marker serves the new index") {
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      val a = vecs
      val b = vecs.withColumn("vec",
        org.apache.spark.sql.functions.transform($"vec", x => -x))
      IvfIndexStore.write(a, path)
      val queries = a.where($"id" < 4)
      intercept[RuntimeException] {
        IvfIndexStore.writeWithFailpoint(b, path, 25, 256, 8, failpoint = 2)
      }
      // committed: the new version serves even though the superseded
      // one was not yet cleaned up
      assert(probeSet(path, queries) ==
        Similarity.ivfTopK(queries, b, k = 3)
          .select($"qid", $"nid", $"cos", $"rank")
          .as[(Long, Long, Double, Int)].collect().toSet)
      // a later write completes the deferred GC under the reader-safe
      // retention: the new version plus the immediately-superseded one
      // remain (an in-flight reader of the superseded version must
      // survive one rewrite); anything older is gone
      IvfIndexStore.write(a, path)
      val vs = new File(path).listFiles()
        .count(_.getName.startsWith("v="))
      assert(vs == 2, s"GC left $vs versions (want current + retained previous)")
      // one more write ages the oldest out: still exactly two
      IvfIndexStore.write(b, path)
      val vs2 = new File(path).listFiles()
        .count(_.getName.startsWith("v="))
      assert(vs2 == 2, s"GC left $vs2 versions after a second rewrite")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("a query stream probes the store; a mid-stream rewrite serves atomically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("ivfidx").toString
    try {
      val a = vecs
      val b = vecs.withColumn("vec",
        org.apache.spark.sql.functions.transform($"vec", x => -x))
      IvfIndexStore.write(a, path)
      val input = MemoryStream[(Long, Seq[Float])]
      val results = scala.collection.mutable.ArrayBuffer
        .empty[Set[(Long, Long, Double)]]
      val q = graft.streaming.Streams.ivfProbeStream(
        input.toDS().toDF("id", "vec"), path, k = 3) { out =>
        results += out.select($"qid", $"nid", $"cos")
          .as[(Long, Long, Double)].collect().toSet
      }
      val queries = (1L to 3L).map { i =>
        (i, (0 until 8).map(d =>
          math.sin(i * 0.37 + d * 1.13).toFloat).toSeq)
      }
      def expected(corpus: org.apache.spark.sql.DataFrame) =
        Similarity.ivfTopK(queries.toDF("id", "vec"), corpus, k = 3)
          .select($"qid", $"nid", $"cos")
          .as[(Long, Long, Double)].collect().toSet
      input.addData(queries)
      q.processAllAvailable()
      assert(results.last == expected(a))
      // maintenance between batches: full index rewrite over corpus B;
      // the next batch must probe the NEW committed version, bit-equal
      // to the in-plan route over B
      IvfIndexStore.write(b, path)
      input.addData(queries)
      q.processAllAvailable()
      q.stop()
      assert(results.size == 2 && results.last == expected(b))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new File(path))
  }

  test("randomized interrupted-write schedules never serve a torn index") {
    // model-based, like BandIndexStoreSpec: a seeded-random sequence
    // of writes, each maybe interrupted at a random failpoint; after
    // every step the probe must equal the in-plan ivfTopK over the
    // last corpus whose write reached the commit marker — never a
    // mixture
    val rnd = new scala.util.Random(1107L)
    val corpora = (0 until 3).map { j =>
      (1L to 80L).map { i =>
        (i, (0 until 8).map(d =>
          math.sin(i * 0.37 + d * 1.13 + j * 2.1).toFloat).toArray.toSeq)
      }.toDF("id", "vec")
    }
    (1 to 3).foreach { _ =>
      val path = Files.createTempDirectory("ivfidx").toString
      try {
        var committed = corpora(0)
        IvfIndexStore.write(committed, path)
        val queries = corpora(0).where($"id" < 4)
        (1 to 4).foreach { _ =>
          val next = corpora(rnd.nextInt(corpora.length))
          rnd.nextInt(3) match {
            case 0 =>
              IvfIndexStore.write(next, path); committed = next
            case 1 =>
              intercept[RuntimeException](IvfIndexStore
                .writeWithFailpoint(next, path, 25, 256, 8, failpoint = 1))
            case 2 =>
              intercept[RuntimeException](IvfIndexStore
                .writeWithFailpoint(next, path, 25, 256, 8, failpoint = 2))
              committed = next
          }
          val expected = Similarity.ivfTopK(queries, committed, k = 3)
            .select($"qid", $"nid", $"cos", $"rank")
            .as[(Long, Long, Double, Int)].collect().toSet
          assert(probeSet(path, queries) == expected)
        }
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new File(path))
    }
  }
}
