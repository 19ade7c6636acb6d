package graft

import org.apache.spark.sql.functions._

import graft.sources.{Codecs, Multimodal}

/** Round-15 additions: the pixel-derived 252-bit DCT perceptual hash
  * (q160) and its composition with the wide Hamming dedup family. */
class PipelineOps8Spec extends SparkSpecBase {
  import spark.implicits._

  private val excluded = Set(0, 239, 254, 255)

  /** Independent non-separable reference: the O(16^4) double loop
    * straight off the DCT-II definition — validates the kernel's
    * separable two-pass form and the pack/threshold plumbing. */
  private def refHash(w: Int, h: Int, px: Array[Int]): Seq[Long] = {
    val t = Multimodal.dctCosTable
    val bw = w / 16; val bh = h / 16
    val blocks = Array.ofDim[Long](16, 16)
    for (y <- 0 until h; x <- 0 until w)
      blocks(x / bw)(y / bh) += px(y * w + x)
    val kept = for {
      u <- 0 until 16
      v <- 0 until 16
      if !excluded(u * 16 + v)
    } yield {
      var s = 0L
      for (bx <- 0 until 16; by <- 0 until 16)
        s += blocks(bx)(by) * t((u * (2 * bx + 1)) % 64) *
          t((v * (2 * by + 1)) % 64)
      s
    }
    val thr = kept.sorted.apply(125)
    val words = new Array[Long](4)
    kept.zipWithIndex.foreach { case (c, i) =>
      if (c > thr) words(i / 63) |= 1L << (i % 63)
    }
    words.toSeq
  }

  test("dctHash256 matches the non-separable reference DCT bit for bit") {
    val t = Multimodal.dctCosTable
    assert(t(0) == 16384L && t(16) == 0L && t(32) == -16384L)
    assert(t(8) == t(56) && t(8) == -t(24)) // cos symmetries survive rounding
    val imgs = Seq((1L, 16, 16), (2L, 32, 16), (3L, 32, 32)).map {
      case (id, w, h) =>
        val px = Array.tabulate(w * h)(i =>
          ((id * 31 + i.toLong * 7) % 256).toInt)
        (id, w, h, px)
    }
    val rows = imgs.map { case (id, w, h, px) =>
      Multimodal.MediaRow(id, "image", Codecs.encodePng(w, h, 1, px),
        Map.empty)
    }
    val got = Multimodal.dctHash256(rows.toDS(), Multimodal.BinaryDecoder)
      .collect().map(r => r.id -> ((r.width, r.height, r.hash))).toMap
    imgs.foreach { case (id, w, h, px) =>
      assert(got(id)._1 == w && got(id)._2 == h)
      assert(got(id)._3 == refHash(w, h, px), s"img $id hash")
    }
    // packing invariants: sign bits clear (63 bits per word), and at
    // most half the 252 bits set (strictly-above-lower-median rule)
    got.values.foreach { case (_, _, ws) =>
      assert(ws.size == 4 && ws.forall(_ >= 0L))
      assert(ws.map(java.lang.Long.bitCount(_)).sum <= 126)
    }
  }

  test("dctHash256 → imageDedupClustersWide: identical frames cluster") {
    def png(seed: Long, bump: Int): Array[Byte] = {
      val w = 32; val h = 32
      val px = Array.tabulate(w * h) { i =>
        val v = ((seed * 37 + (i / 64).toLong * 13) % 250).toInt
        if (bump > 0 && i == 100) v + bump else v
      }
      Codecs.encodePng(w, h, 1, px)
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png(1, 0), Map.empty),
      Multimodal.MediaRow(2L, "image", png(1, 0), Map.empty), // identical
      Multimodal.MediaRow(3L, "image", png(1, 2), Map.empty), // near-dup
      Multimodal.MediaRow(4L, "image", png(9, 0), Map.empty)) // unrelated
    val hashes = Multimodal.dctHash256(rows.toDS(),
      Multimodal.BinaryDecoder).toDF("doc_id", "width", "height", "h")
    val out = graft.operators.Dedup.imageDedupClustersWide(
        hashes, "doc_id", "h", nWords = 4, maxDist = 6)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false))) // identical pixels → same hash
    assert(out.size == 4)
    // the one-block nudge stays a SMALL perturbation: doc 3 is either
    // clustered with 1 or its own singleton — never with unrelated 4
    assert(out(3L)._1 == 1L || out(3L)._1 == 3L)
    assert(out(4L) == ((4L, true)))
  }

  test("htmlExtract: scripts/styles/comments vanish, blocks, entities") {
    val html = "<html><head><style>p { x: 1 }</style>" +
      "<script>if (a < b) { track('p&q'); }</script></head>" +
      "<body><h1>Title</h1><p>Hello <b>world</b></p>" +
      "<!-- <p>ghost</p> -->" +
      "<div>Tom &amp; Jerry &lt;3 &amp;lt;esc&nbsp;&quot;q&#39;</div>" +
      "<ul><li>a1</li><li>b2</li></ul></body></html>"
    val out = graft.operators.CorpusOps.htmlExtract(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, String)].collect().head
    // script content with unescaped < & > vanishes wholesale; the
    // comment's tag-like text never surfaces; <b> is inline (no block
    // break); &amp;lt; decodes to the literal text "&lt;"
    assert(out._3 ==
      "Title\nHello world\nTom & Jerry <3 &lt;esc \"q'\na1\nb2", out._3)
    assert(out._2 == 5L)
  }

  test("htmlExtract → hostBoilerplateStrip: the crawl-side composition") {
    val nav = "nav home about contact subscribe cookie banner terms " +
      "privacy login" // exactly 10 words = one boilerplate segment
    def page(id: Long, withNav: Boolean, body: String) = (id, "h0",
      s"<html><body>${if (withNav) s"<div>$nav</div>" else ""}" +
        s"<p>$body</p></body></html>")
    val body1 = "alpha beta gamma delta eps zeta eta theta iota kappa"
    val body2 = "one two three four five six seven eight nine ten"
    val body3 = "lone body words here spread across ten tokens now fin"
    val docs = Seq(page(1L, true, body1), page(2L, true, body2),
      page(3L, false, body3)).toDF("doc_id", "host", "html")
    val text = graft.operators.CorpusOps.htmlExtract(
        docs, "doc_id", "html")
      .join(docs.select(col("doc_id"), col("host")), "doc_id")
    val out = graft.operators.CorpusOps.hostBoilerplateStrip(
        text, "doc_id", "host", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def fp(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // the nav block (2 of 3 docs on host h0 > 50%) strips; bodies stay
    assert(out(1L) == ((2L, 1L, fp(body1))))
    assert(out(2L) == ((2L, 1L, fp(body2))))
    assert(out(3L) == ((1L, 0L, fp(body3))))
  }

  test("incremental CDC chunk dedup: persisted index, tombstones, geometry") {
    import graft.operators.{BandIndexStore, Dedup}
    val words = (0 until 200).map(i => s"w${i * 37 % 211}").mkString(" ")
    val corpus = Seq((10L, words),
      (11L, (0 until 80).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, words), // identical to corpus doc 10 → every chunk dup
      (21L, (0 until 60).map(i => s"z$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdcidx").toString
    try {
      BandIndexStore.writeBands(
        Dedup.cdcChunkBands(corpus, "doc_id", "text"), dir)
      val idx = BandIndexStore.read(spark, dir)
      val got = Dedup.incrementalCdcChunkDedup(
          batch, "doc_id", "text", idx)
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      val (n20, d20, t20) = got(20L)
      assert(t20 == 200 && d20 == n20, s"all chunks of 20 dup: $got")
      assert(got(21L)._2 == 0L, s"unrelated doc clean: $got")
      // self-exclusion: a re-crawled doc (same id as its committed
      // index rows) is never a duplicate of ITSELF — its chunks'
      // sole owner is the probing id
      val self = Dedup.incrementalCdcChunkDedup(
          Seq((10L, words)).toDF("doc_id", "text"), "doc_id", "text",
          idx)
        .as[(Long, Long, Long, Long)].collect().head
      assert(self._3 == 0L, s"self-match must not count: $self")
      // but the same text under a NEW id still counts (doc 20 above),
      // and the fingerprint APIs refuse the CDC index loudly
      val exh = intercept[IllegalArgumentException] {
        Dedup.incrementalHammingCandidates(
          Seq((1L, 42L)).toDF("doc_id", "h"), "doc_id", "h", idx,
          maxDist = 3)
      }
      assert(exh.getMessage.contains("CDC chunk bands"), exh.getMessage)
      val exw = intercept[IllegalArgumentException] {
        Dedup.incrementalHammingCandidatesWide(
          Seq((1L, Seq(42L, 7L))).toDF("doc_id", "h"), "doc_id", "h",
          idx, nWords = 2, maxDist = 6)
      }
      assert(exw.getMessage.contains("CDC chunk bands"), exw.getMessage)
      // tombstone the identical corpus doc → its chunks stop matching
      BandIndexStore.appendBands(spark, dir,
        Dedup.cdcChunkBands(corpus.where(col("doc_id") < 0),
          "doc_id", "text"),
        Seq(10L).toDF("id"))
      val got2 = Dedup.incrementalCdcChunkDedup(batch, "doc_id", "text",
          BandIndexStore.read(spark, dir))
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> t._3).toMap
      assert(got2(20L) == 0L, s"tombstoned chunks must not match: $got2")
      // geometry refusals, both directions
      val ex = intercept[IllegalArgumentException] {
        Dedup.incrementalCdcChunkDedup(batch, "doc_id", "text", idx,
          k = 5, hexThreshold = "2")
      }
      assert(ex.getMessage.contains("does not match CDC probe geometry"),
        ex.getMessage)
      val hamIdx = Dedup.hammingBands(
        Seq((1L, 42L)).toDF("doc_id", "h"), "doc_id", "h", maxDist = 6)
      val ex2 = intercept[IllegalArgumentException] {
        Dedup.incrementalCdcChunkDedup(batch, "doc_id", "text", hamIdx)
      }
      assert(ex2.getMessage.contains("fingerprint bands"), ex2.getMessage)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("unigramLmSegment: DP optimum equals exhaustive enumeration") {
    def md5hex(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    def inVocab(p: String) = p.length == 1 || md5hex(p).charAt(0) < '8'
    def cost(p: String) =
      1000L - 180L * p.length + Integer.parseInt(
        md5hex(p).substring(1, 3), 16)
    def enumerate(word: String): Seq[(Long, Long)] =
      if (word.isEmpty) Seq((0L, 0L))
      else (1 to math.min(4, word.length)).flatMap { l =>
        val piece = word.substring(0, l)
        if (inVocab(piece))
          enumerate(word.substring(l)).map { case (c, p) =>
            (c + cost(piece), p + 1L)
          }
        else Nil
      }
    val docs = Seq(
      (1L, "hello data tokenization a ab"),
      (2L, "Subword UNITS matter"), // case-folds before segmenting
      (3L, ""), (4L, "   "),
      // leading tab + trailing space: normToks' space-only trim keeps
      // the tab, so the split yields a leading EMPTY word — the
      // operator must reproduce that, not Java-trim it away
      (5L, "\thello world  "))
    val got = graft.operators.TextAnalysis.unigramLmSegment(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    docs.foreach { case (id, text) =>
      val words = {
        // Spark-exact normToks: locale-free lowercase, space-only
        // trim, regex split keeping trailing empties
        val t0 = text.toLowerCase(java.util.Locale.ROOT)
        val t = t0.dropWhile(_ == ' ')
          .reverse.dropWhile(_ == ' ').reverse
        if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
      }
      val bests = words.map(w => enumerate(w).min)
      val want = (words.length.toLong, bests.map(_._2).sum,
        bests.map(_._1).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    assert(got(3L) == ((0L, 0L, 0L)) && got(4L) == ((0L, 0L, 0L)))
  }

  test("q162 composition on sf0.001: keep = image ∧ caption ∧ clip") {
    val rows = graft.queries.Pipeline13.pairCurationClip(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var passes = 0
    rows.foreach { r =>
      val (ik, cp) = (r.getBoolean(2), r.getBoolean(3))
      val cos = r.getDouble(4)
      val (clip, keep) = (r.getBoolean(5), r.getBoolean(6))
      assert(cos >= -1.0 && cos <= 1.0)
      assert(clip == (cos >= 0.55))
      assert(keep == (ik && cp && clip))
      if (clip) passes += 1
    }
    assert(passes > 0 && passes < rows.length,
      s"threshold must split the corpus: $passes/${rows.length}")
  }

  test("dctHash256 guards: dimensions and the int64 overflow bound") {
    val bad = Seq(Multimodal.MediaRow(1L, "image",
      "x".getBytes("UTF-8"), Map.empty))
    val ex = intercept[org.apache.spark.SparkException] {
      // StubDecoder yields an 8×8 plane — not divisible by 16
      Multimodal.dctHash256(bad.toDS(), Multimodal.StubDecoder).count()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("divisible by 16"), msg)
    val big = new Multimodal.Decoder {
      def decode(mt: String, b: Array[Byte]): (Int, Int, Array[Float]) =
        (16384, 1040, new Array[Float](16384 * 1040)) // > 2^24 px
    }
    val ex2 = intercept[org.apache.spark.SparkException] {
      Multimodal.dctHash256(bad.toDS(), big).count()
    }
    val msg2 = ex2.getMessage +
      Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("overflow bound"), msg2)
  }
}
