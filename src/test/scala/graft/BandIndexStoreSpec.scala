package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{BandIndexStore, Dedup}

/** Maintenance lifecycle of the persisted LSH band index: tombstoned
  * deletes, dirty-set-bounded compaction, byte-stability of clean
  * buckets. */
class BandIndexStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def doc(id: Long, seed: String) =
    (id, (0 until 12).map(i => s"$seed$i").mkString(" "))

  private def tmp() =
    Files.createTempDirectory("bandidx").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))

  private def bucketFiles(path: String): Map[String, Seq[(String, Long)]] = {
    val snap = new File(s"$path/snap")
    snap.listFiles().filter(_.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map(f => (f.getName, f.lastModified())).sortBy(_._1))
      .toMap
  }

  test("hot-band stats sidecar answers what the full aggregate would") {
    val path = tmp()
    try {
      // one genuinely hot band (1500 ids share a fingerprint, so all
      // its band keys cross the 1024 stats floor) + a cold tail
      val hot = (0L until 1500L).map(i => (i, 42L))
      val cold = (2000L until 2050L).map(i => (i, i * 977L))
      val bands = Dedup.hammingBands(
        (hot ++ cold).toDF("doc_id", "h"), "doc_id", "h", maxDist = 3)
      BandIndexStore.writeBands(bands, path, buckets = 8)
      // stats floor (1024) ≤ threshold: answered from the sidecar and
      // identical to aggregating the resolved index
      val fromStats = BandIndexStore.readHotBands(spark, path, 1200L)
      assert(fromStats.isDefined)
      val expected = BandIndexStore.read(spark, path)
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .where(col("n") > 1200L)
        .select(col("band")).as[String].collect().toSet
      assert(fromStats.get.toSet == expected && expected.nonEmpty)
      // a threshold below the floor cannot be answered
      assert(BandIndexStore.readHotBands(spark, path, 100L).isEmpty)
      // appends contribute generation stats (counts are additive)
      BandIndexStore.appendBands(spark, path,
        Dedup.hammingBands((5000L until 6200L).map(i => (i, 42L))
          .toDF("doc_id", "h"), "doc_id", "h", maxDist = 3),
        spark.emptyDataFrame.select(lit(0L).as("doc_id")).where(lit(false)))
      val afterAppend = BandIndexStore.readHotBands(spark, path, 2000L)
      assert(afterAppend.isDefined && afterAppend.get.nonEmpty,
        "snap(1500) + gen(1200) counts must cross 2000 summed")
      // compaction folds the log and refreshes the snapshot stats
      BandIndexStore.compact(spark, path)
      val afterCompact = BandIndexStore.readHotBands(spark, path, 2000L)
      assert(afterCompact.isDefined &&
        afterCompact.get.toSet == afterAppend.get.toSet)
      // the small-store common case: empty hot set, still Some
      val small = tmp()
      try {
        BandIndexStore.writeBands(Dedup.hammingBands(
          Seq((1L, 7L), (2L, 9L)).toDF("doc_id", "h"), "doc_id", "h",
          maxDist = 3), small, buckets = 4)
        assert(BandIndexStore.readHotBands(spark, small, 100000L)
          .contains(Seq.empty))
      } finally rm(small)
    } finally rm(path)
  }

  test("probe with stats-derived hot set matches the aggregate route") {
    val path = tmp()
    try {
      val hot = (0L until 1500L).map(i => (i, 42L))
      val cold = (2000L until 2050L).map(i => (i, i * 977L))
      val corpus = (hot ++ cold).toDF("doc_id", "h")
      BandIndexStore.writeBands(Dedup.hammingBands(
        corpus, "doc_id", "h", maxDist = 3), path, buckets = 8)
      val index = BandIndexStore.read(spark, path)
      val batch = Seq((9001L, 42L), (9002L, 43L), (9003L, 2013L * 977L))
        .toDF("doc_id", "h")
      val noStats = Dedup.incrementalHammingCandidates(
        batch, "doc_id", "h", index, maxDist = 3,
        corpusHashes = Some(corpus), maxBandDf = 1200L)
        .as[(Long, Long)].collect().toSet
      val withStats = Dedup.incrementalHammingCandidates(
        batch, "doc_id", "h", index, maxDist = 3,
        corpusHashes = Some(corpus), maxBandDf = 1200L,
        hotBands = BandIndexStore.readHotBands(spark, path, 1200L))
        .as[(Long, Long)].collect().toSet
      assert(withStats == noStats && noStats.nonEmpty)
    } finally rm(path)
  }

  test("a deleted doc stops surfacing as a candidate") {
    val path = tmp()
    try {
      val corpus = Seq(doc(1, "a"), doc(2, "b"), doc(3, "c"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      // the probe batch duplicates doc 2's text → candidate before
      val probe = Seq(doc(10, "b")).toDF("doc_id", "text")
      def candidates() = Dedup.incrementalNearDupCandidates(
        probe, "doc_id", "text", BandIndexStore.read(spark, path))
        .as[(Long, Long)].collect().toSet
      assert(candidates() == Set((10L, 2L)))
      // tombstone doc 2 (no adds): candidate gone BEFORE compaction
      BandIndexStore.append(spark, path,
        corpus.where(lit(false)), "doc_id", "text",
        Seq(2L).toDF("doc_id"))
      assert(candidates().isEmpty)
      // ...and still gone after
      BandIndexStore.compact(spark, path)
      assert(candidates().isEmpty)
      assert(!new File(s"$path/log").exists())
    } finally rm(path)
  }

  test("delete-then-re-add in one batch replaces; later tombstone wins") {
    val path = tmp()
    try {
      val corpus = Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      // replace doc 2's text in ONE batch (delete + add, same gen)
      BandIndexStore.append(spark, path,
        Seq(doc(2, "z")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(2L).toDF("doc_id"))
      val afterReplace = BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet
      val expected = Dedup.bandIndex(
        Seq(doc(1, "a"), doc(2, "z")).toDF("doc_id", "text"),
        "doc_id", "text").as[(Long, String)].collect().toSet
      assert(afterReplace == expected)
      // a LATER tombstone kills the re-add
      BandIndexStore.append(spark, path,
        corpus.where(lit(false)), "doc_id", "text",
        Seq(2L).toDF("doc_id"))
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet ==
        expected.filter(_._1 == 1L))
    } finally rm(path)
  }

  test("compaction equals the log view, only dirty buckets rewritten") {
    val path = tmp()
    try {
      val corpus = (1L to 40L).map(i => doc(i, s"s$i"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      val before = bucketFiles(path)
      BandIndexStore.append(spark, path,
        (41L to 44L).map(i => doc(i, s"s$i")).toDF("doc_id", "text"),
        "doc_id", "text",
        Seq(3L, 17L).toDF("doc_id"))
      val logView = BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet
      // the dirty set: buckets of deleted ids' rows + of the adds
      val dirty = (Dedup.bandIndex(
          corpus.where($"doc_id".isin(3L, 17L)), "doc_id", "text")
        .unionByName(Dedup.bandIndex(
          (41L to 44L).map(i => doc(i, s"s$i")).toDF("doc_id", "text"),
          "doc_id", "text"))
        .select(pmod(xxhash64($"band"), lit(8)).cast("int")))
        .as[Int].collect().toSet
      BandIndexStore.compact(spark, path)
      // resolved view unchanged by compaction
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == logView)
      // ...equals a from-scratch rebuild of the surviving corpus
      val survivors = corpus.where(!$"doc_id".isin(3L, 17L))
        .unionByName((41L to 44L).map(i => doc(i, s"s$i"))
          .toDF("doc_id", "text"))
      assert(logView == Dedup.bandIndex(survivors, "doc_id", "text")
        .as[(Long, String)].collect().toSet)
      // clean buckets byte-untouched (same files, same mtimes)
      val after = bucketFiles(path)
      val clean = before.keySet
        .filterNot(k => dirty.contains(k.stripPrefix("bucket=").toInt))
      assert(clean.nonEmpty, "fixture produced no clean bucket")
      clean.foreach { k => assert(after(k) == before(k), s"$k rewritten") }
      // second compaction is a no-op (no log)
      BandIndexStore.compact(spark, path)
      assert(bucketFiles(path) == after)
    } finally rm(path)
  }

  test("an append generation fans out across bucket partitions") {
    val path = tmp()
    try {
      val corpus = (1L to 8L).map(i => doc(i, s"s$i"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      val batch = (9L to 40L).map(i => doc(i, s"t$i"))
        .toDF("doc_id", "text")
      BandIndexStore.append(spark, path, batch, "doc_id", "text",
        Seq(1L).toDF("doc_id"))
      // the log generation is hash-partitioned by band bucket — a big
      // re-crawl batch writes in parallel, never through one task
      val genDirs = new File(s"$path/log/gen=1").listFiles()
        .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
      assert(genDirs.size > 1, s"single-partition generation: $genDirs")
      // resolution semantics unchanged by the fan-out
      val expected = Dedup.bandIndex(
        corpus.where($"doc_id" =!= 1L).unionByName(batch),
        "doc_id", "text").as[(Long, String)].collect().toSet
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
      BandIndexStore.compact(spark, path)
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
    } finally rm(path)
  }

  test("crash BEFORE the commit marker rolls back; the log replays") {
    val path = tmp()
    try {
      val corpus = (1L to 20L).map(i => doc(i, s"s$i"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      BandIndexStore.append(spark, path,
        Seq(doc(21L, "t21")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(3L).toDF("doc_id"))
      val expected = BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet
      intercept[RuntimeException] {
        BandIndexStore.compactWithFailpoint(spark, path, failpoint = 1)
      }
      assert(new File(s"$path/snap_compact_tmp").exists())
      // recovery (run by any entry point) discards the uncommitted
      // rewrite; the intact log still resolves to the same view
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
      assert(!new File(s"$path/snap_compact_tmp").exists())
      assert(new File(s"$path/log").exists(), "log must survive rollback")
      BandIndexStore.compact(spark, path)
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
      assert(!new File(s"$path/log").exists())
    } finally rm(path)
  }

  test("crash AFTER the commit marker rolls forward; no bucket lost") {
    val path = tmp()
    try {
      val corpus = (1L to 20L).map(i => doc(i, s"s$i"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      BandIndexStore.append(spark, path,
        Seq(doc(21L, "t21")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(3L, 7L).toDF("doc_id"))
      val expected = BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet
      intercept[RuntimeException] {
        BandIndexStore.compactWithFailpoint(spark, path, failpoint = 2)
      }
      assert(new File(s"$path/snap_compact_tmp/_COMMIT").exists())
      // recovery completes the committed swap: same resolved view,
      // log folded away, sibling cleared
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
      assert(!new File(s"$path/snap_compact_tmp").exists())
      assert(!new File(s"$path/log").exists())
      // and the healed snapshot equals a from-scratch rebuild
      val rebuilt = Dedup.bandIndex(
        corpus.where(!$"doc_id".isin(3L, 7L))
          .unionByName(Seq(doc(21L, "t21")).toDF("doc_id", "text")),
        "doc_id", "text").as[(Long, String)].collect().toSet
      assert(expected == rebuilt)
    } finally rm(path)
  }

  test("append+compact survive a snapshot whose buckets all died") {
    val path = tmp()
    try {
      val corpus = Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 4)
      BandIndexStore.append(spark, path,
        corpus.where(lit(false)), "doc_id", "text",
        Seq(1L, 2L).toDF("doc_id"))
      BandIndexStore.compact(spark, path)
      assert(!new File(s"$path/snap").listFiles()
        .exists(_.getName.startsWith("bucket=")))
      // the next maintenance cycle over the emptied snapshot must not
      // throw (compact's snap read is empty-state guarded, like read's)
      BandIndexStore.append(spark, path,
        Seq(doc(3, "c")).toDF("doc_id", "text"), "doc_id", "text",
        corpus.where(lit(false)).select($"doc_id"))
      BandIndexStore.compact(spark, path)
      val expected = Dedup.bandIndex(
        Seq(doc(3, "c")).toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, String)].collect().toSet
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
    } finally rm(path)
  }

  test("a crawler stream probes the maintained index (stream-static join)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    try {
      val corpus = Seq(doc(1, "a"), doc(2, "b"), doc(3, "c"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      // maintenance between crawls: doc 2 deleted, doc 4 added
      BandIndexStore.append(spark, path,
        Seq(doc(4, "d")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(2L).toDF("doc_id"))
      val input = MemoryStream[(Long, String)]
      val probe = graft.streaming.Streams.indexProbeStream(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        BandIndexStore.read(spark, path))
      val q = probe.writeStream.outputMode("append")
        .format("memory").queryName("idx_probe").start()
      // batch 1: re-crawl of doc 1's text + a doc matching the DELETED
      // doc 2 + fresh content
      input.addData(Seq(doc(10, "a"), doc(11, "b"), doc(12, "z")))
      q.processAllAvailable()
      // batch 2: a doc matching the APPENDED doc 4
      input.addData(Seq(doc(13, "d")))
      q.processAllAvailable(); q.stop()
      val pairs = spark.table("idx_probe")
        .select($"new_id", $"indexed_id")
        .as[(Long, Long)].collect().toSet
      // doc 2 is tombstoned: its re-crawl surfaces NO candidate; the
      // log-resident add (doc 4) is probed without compaction
      assert(pairs == Set((10L, 1L), (13L, 4L)))
    } finally rm(path)
  }

  test("a fingerprint stream probes the maintained hash index (both guard paths)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def mkHash(seed: Long): Long = {
      var h = 0L
      (0 until 63).foreach { i =>
        if ((seed * 19 + i * 13) % 6 == 0) h |= 1L << i
      }
      h
    }
    // corpus: ids 1-2 share a fingerprint (the hot-band shape), 3 is
    // distinct; id 2 gets tombstoned before the stream starts
    val corpus = Seq((1L, mkHash(7)), (2L, mkHash(7)), (3L, mkHash(40)))
    for (cap <- Seq(100000L, 1L)) { // default and forcing-hot caps
      val path = tmp()
      try {
        BandIndexStore.writeBands(Dedup.hammingBands(
          corpus.toDF("id", "h"), "id", "h", maxDist = 3), path,
          buckets = 8)
        BandIndexStore.appendBands(spark, path,
          Dedup.hammingBands(Seq((4L, mkHash(7) ^ 3L)).toDF("id", "h"),
            "id", "h", maxDist = 3),
          Seq(2L).toDF("id"))
        val input = MemoryStream[(Long, Long)]
        val probe = graft.streaming.Streams.hashProbeStream(
          input.toDS().toDF("id", "h"), "id", "h",
          BandIndexStore.read(spark, path), maxDist = 3,
          corpusHashes = Some((corpus :+ (4L, mkHash(7) ^ 3L))
            .toDF("id", "h")),
          maxBandDf = cap)
        val name = s"hash_probe_$cap"
        val q = probe.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        input.addData(Seq((10L, mkHash(7)), (11L, mkHash(40) ^ 1L)))
        q.processAllAvailable(); q.stop()
        val pairs = spark.table(name)
          .select($"new_id", $"indexed_id")
          .as[(Long, Long)].collect().toSet
        // 10 matches the shared fingerprint: live ids 1 and 4 surface
        // (4 only via its shared bands), the TOMBSTONED 2 never does —
        // including through the hot-band expansion; 11 matches 3
        assert(pairs == Set((10L, 1L), (10L, 4L), (11L, 3L)),
          s"cap=$cap: $pairs")
      } finally rm(path)
    }
  }

  test("a WIDE fingerprint stream probes the maintained hash index (both guard paths)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def mkHash(seed: Long): Seq[Long] = (0 until 2).map { w =>
      var h = 0L
      (0 until 63).foreach { i =>
        if ((seed * 19 + (w * 63 + i) * 13) % 6 == 0) h |= 1L << i
      }
      h
    }
    def flip(h: Seq[Long], p: Int): Seq[Long] = {
      val a = h.toArray; a(p / 63) ^= 1L << (p % 63); a.toSeq
    }
    // corpus: ids 1-2 share a wide fingerprint (hot-band shape), 3 is
    // distinct; id 2 tombstoned before the stream starts; id 4
    // appended as a 2-bit-flipped twin of the shared hash
    val corpus = Seq((1L, mkHash(7)), (2L, mkHash(7)), (3L, mkHash(40)))
    val h4 = flip(flip(mkHash(7), 5), 90)
    for (cap <- Seq(100000L, 1L)) {
      val path = tmp()
      try {
        BandIndexStore.writeBands(Dedup.hammingBandsWide(
          corpus.toDF("id", "h"), "id", "h", nWords = 2, maxDist = 5),
          path, buckets = 8)
        BandIndexStore.appendBands(spark, path,
          Dedup.hammingBandsWide(Seq((4L, h4)).toDF("id", "h"),
            "id", "h", nWords = 2, maxDist = 5),
          Seq(2L).toDF("id"))
        val input = MemoryStream[(Long, Seq[Long])]
        val probe = graft.streaming.Streams.hashProbeStreamWide(
          input.toDS().toDF("id", "h"), "id", "h",
          BandIndexStore.read(spark, path), nWords = 2, maxDist = 5,
          corpusHashes = Some((corpus :+ (4L, h4)).toDF("id", "h")),
          maxBandDf = cap)
        val name = s"hash_probe_wide_$cap"
        val q = probe.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        input.addData(Seq((10L, mkHash(7)), (11L, flip(mkHash(40), 1))))
        q.processAllAvailable(); q.stop()
        val pairs = spark.table(name)
          .select($"new_id", $"indexed_id")
          .as[(Long, Long)].collect().toSet
        // 10 matches the shared wide fingerprint: live ids 1 and 4
        // surface, the TOMBSTONED 2 never does — including through
        // the hot-band expansion; 11 matches 3
        assert(pairs == Set((10L, 1L), (10L, 4L), (11L, 3L)),
          s"cap=$cap: $pairs")
        // the wrong-geometry stream is refused at DEFINITION
        val ex = intercept[IllegalArgumentException] {
          graft.streaming.Streams.hashProbeStreamWide(
            input.toDS().toDF("id", "h"), "id", "h",
            BandIndexStore.read(spark, path), nWords = 2, maxDist = 3)
        }
        assert(ex.getMessage.contains("does not match wide probe geometry"))
      } finally rm(path)
    }
  }

  test("a PIXEL stream DCT-hashes and probes the maintained wide index") {
    // the full streaming image re-crawl with nothing synthetic:
    // arriving frames decode → dctHash256 (stateless mapPartitions on
    // the stream) → wide bands → stream-static join vs the committed
    // index. Corpus ids 1-2 share identical pixels (one hash), 3 is
    // unrelated; 2 is tombstoned before the stream starts.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Multimodal
    def png(seed: Long): Array[Byte] = {
      val px = Array.tabulate(32 * 32) { i =>
        val b = ((i / 32) / 2) * 16 + (i % 32) / 2
        ((seed * 37 + b.toLong * 13) % 250).toInt
      }
      graft.sources.Codecs.encodePng(32, 32, 1, px)
    }
    def hashed(rows: Seq[(Long, Array[Byte])]) =
      Multimodal.dctHash256(rows.map { case (id, b) =>
        Multimodal.MediaRow(id, "image", b, Map.empty)
      }.toDS()).toDF("id", "wd", "ht", "h").select($"id", $"h")
    val path = tmp()
    try {
      BandIndexStore.writeBands(Dedup.hammingBandsWide(
        hashed(Seq((1L, png(7)), (2L, png(7)), (3L, png(40)))),
        "id", "h", nWords = 4, maxDist = 6), path, buckets = 8)
      BandIndexStore.appendBands(spark, path,
        Dedup.hammingBandsWide(hashed(Seq.empty), "id", "h",
          nWords = 4, maxDist = 6),
        Seq(2L).toDF("id"))
      val input = MemoryStream[(Long, Array[Byte])]
      val media = input.toDS().map { case (id, bytes) =>
        Multimodal.MediaRow(id, "image", bytes, Map.empty)
      }
      val hashes = Multimodal.dctHash256(media)
        .toDF("id", "wd", "ht", "h").select($"id", $"h")
      val probe = graft.streaming.Streams.hashProbeStreamWide(
        hashes, "id", "h", BandIndexStore.read(spark, path),
        nWords = 4, maxDist = 6)
      val q = probe.writeStream.outputMode("append")
        .format("memory").queryName("pdq_stream").start()
      input.addData(Seq((10L, png(7)), (11L, png(99))))
      q.processAllAvailable(); q.stop()
      val pairs = spark.table("pdq_stream")
        .select($"new_id", $"indexed_id").as[(Long, Long)].collect()
        .toSet
      // the re-encoded frame matches the LIVE twin only (2 is
      // tombstoned); the unrelated frame matches nothing
      assert(pairs == Set((10L, 1L)), s"got: $pairs")
    } finally rm(path)
  }

  test("a document stream CDC-probes the maintained chunk index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val shared = (0 until 120).map(i => s"w${i * 37 % 211}").mkString(" ")
    // corpus: docs 1 and 2 both carry the shared text (so its chunks
    // map to both ids); doc 2 is tombstoned before the stream starts
    val corpus = Seq((1L, shared), (2L, shared),
      (3L, (0 until 50).map(i => s"c$i").mkString(" ")))
    val path = tmp()
    try {
      BandIndexStore.writeBands(Dedup.cdcChunkBands(
        corpus.toDF("id", "text"), "id", "text"), path, buckets = 8)
      BandIndexStore.appendBands(spark, path,
        Dedup.cdcChunkBands(corpus.toDF("id", "text")
          .where($"id" < 0), "id", "text"),
        Seq(2L).toDF("id"))
      val input = MemoryStream[(Long, String)]
      val probe = graft.streaming.Streams.cdcProbeStream(
        input.toDS().toDF("id", "text"), "id", "text",
        BandIndexStore.read(spark, path))
      val q = probe.writeStream.outputMode("append")
        .format("memory").queryName("cdc_probe").start()
      input.addData(Seq((10L, shared),
        (11L, (0 until 40).map(i => s"z$i").mkString(" ")),
        (1L, shared))) // re-crawl of the committed doc 1 itself
      q.processAllAvailable(); q.stop()
      val rows = spark.table("cdc_probe")
        .select($"new_id", $"indexed_id").as[(Long, Long)].collect()
      // doc 10's chunks all hit the LIVE owner 1; the tombstoned 2
      // never surfaces; the unrelated 11 hits nothing; the
      // re-crawled doc 1 never matches ITSELF (no (1,1) rows)
      assert(rows.nonEmpty && rows.forall(_ == ((10L, 1L))),
        s"got: ${rows.toSet}")
      // wrong geometry and wrong family are refused at DEFINITION
      val ex = intercept[IllegalArgumentException] {
        graft.streaming.Streams.cdcProbeStream(
          input.toDS().toDF("id", "text"), "id", "text",
          BandIndexStore.read(spark, path), k = 5)
      }
      assert(ex.getMessage.contains("does not match CDC probe geometry"))
    } finally rm(path)
  }

  test("randomized maintenance schedules match the rebuild model") {
    // model-based: apply seeded-random append/delete/compact schedules
    // to the store and after every op compare the resolved view with
    // a from-scratch banding of the model corpus (map id -> text with
    // delete-before-add batch semantics)
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { schedule =>
      val path = tmp()
      try {
        var model = (1L to 8L).map(i => i -> s"s${schedule}_$i").toMap
        var nextId = 100L * schedule
        BandIndexStore.write(
          model.toSeq.map { case (i, s) => doc(i, s) }
            .toDF("doc_id", "text"),
          "doc_id", "text", path, buckets = 8)
        def assertMatchesModel(): Unit = {
          val expected = Dedup.bandIndex(
            model.toSeq.map { case (i, s) => doc(i, s) }
              .toDF("doc_id", "text"), "doc_id", "text")
            .as[(Long, String)].collect().toSet
          val got = BandIndexStore.read(spark, path)
            .as[(Long, String)].collect().toSet
          assert(got == expected, s"schedule $schedule diverged")
        }
        (1 to 4).foreach { _ =>
          val deletes = model.keys.toSeq.sorted
            .filter(_ => rnd.nextDouble() < 0.3)
          val adds = (0 until rnd.nextInt(3)).map { _ =>
            nextId += 1; nextId -> s"t${schedule}_$nextId"
          }
          // contract: delete-before-add within the batch — an id both
          // deleted and re-added is a REPLACE
          val readd = deletes.filter(_ => rnd.nextBoolean()).map { i =>
            i -> s"r${schedule}_${i}_$nextId"
          }
          model = (model -- deletes) ++ adds ++ readd
          BandIndexStore.append(spark, path,
            (adds ++ readd).map { case (i, s) => doc(i, s) }
              .toDF("doc_id", "text"),
            "doc_id", "text", deletes.toDF("doc_id"))
          assertMatchesModel()
          if (rnd.nextBoolean()) {
            BandIndexStore.compact(spark, path)
            assertMatchesModel()
          }
        }
        BandIndexStore.compact(spark, path)
        assertMatchesModel()
      } finally rm(path)
    }
  }

  test("a delete-only generation spreads tombstones across buckets") {
    val path = tmp()
    try {
      val corpus = (1L to 64L).map(i => doc(i, s"s$i"))
        .toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 8)
      // a planet-scale delete batch: band is null on every tombstone,
      // so bucketing by band would funnel ALL of them into the one
      // null-hash bucket — they must spread by id instead
      BandIndexStore.append(spark, path,
        corpus.where(lit(false)), "doc_id", "text",
        (1L to 32L).toDF("doc_id"))
      val genDirs = new File(s"$path/log/gen=1").listFiles()
        .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
      assert(genDirs.size > 1,
        s"tombstone generation funneled into $genDirs")
      // resolution semantics unchanged by the spread (id-keyed)
      val expected = Dedup.bandIndex(
        corpus.where($"doc_id" > 32L), "doc_id", "text")
        .as[(Long, String)].collect().toSet
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
      BandIndexStore.compact(spark, path)
      assert(BandIndexStore.read(spark, path)
        .as[(Long, String)].collect().toSet == expected)
    } finally rm(path)
  }

  test("a bucket whose rows all die is dropped, even with no survivors") {
    val path = tmp()
    try {
      val corpus = Seq(doc(1, "a")).toDF("doc_id", "text")
      BandIndexStore.write(corpus, "doc_id", "text", path, buckets = 4)
      BandIndexStore.append(spark, path,
        corpus.where(lit(false)), "doc_id", "text",
        Seq(1L).toDF("doc_id"))
      BandIndexStore.compact(spark, path)
      assert(BandIndexStore.read(spark, path).count() == 0L)
      assert(!new File(s"$path/snap").listFiles()
        .exists(_.getName.startsWith("bucket=")))
    } finally rm(path)
  }
}
