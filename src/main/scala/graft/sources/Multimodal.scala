package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time.
  *
  * The decode step is STUBBED (this environment ships no image/audio
  * codecs): [[StubDecoder]] produces deterministic fake pixels from the
  * bytes. The Spark-side plumbing — schema, partition-sized batching,
  * mapPartitions boundary (the Scala analog of mapInPandas: one
  * iterator per partition, so a real decoder amortizes model/codec init
  * across the whole batch) — is real and tested.
  */
object Multimodal {

  final case class MediaRow(
      id: Long,
      mediaType: String, // image | audio | video
      bytes: Array[Byte],
      meta: Map[String, String])

  final case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Int,
      width: Int,
      height: Int,
      /** channel-mean "embedding" of the decoded frame */
      features: Seq[Float])

  /** The decoder seam a real deployment swaps for libjpeg/ffmpeg
    * bindings. Kept as a trait so the pipeline shape is testable
    * without codecs. */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float])
  }

  /** Deterministic fake: "pixels" are a rolling hash of the payload —
    * stable across runs, so tests can assert on outputs. */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = 8; val h = 8
      var state = 1469598103934665603L // FNV offset basis
      val px = new Array[Float](w * h)
      var i = 0
      while (i < px.length) {
        val b = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
        state = (state ^ b) * 1099511628211L
        px(i) = ((state >>> 40) & 0xff) / 255.0f
        i += 1
      }
      (w, h, px)
    }
  }

  /** Second stub: a 4×4 "frame" whose pixels are the md5 digest bytes
    * of the payload. Unlike [[StubDecoder]] this is expressible in
    * ANSI SQL (md5 + hex arithmetic), so the decode → mapPartitions →
    * feature plumbing itself can be hash-verified against the DuckDB
    * oracle (q27), not just unit-tested. */
  object Md5Decoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      (4, 4, d.map(b => (b & 0xff).toFloat))
    }
  }

  /** Decode + feature-extract over partition-sized batches. The
    * decoder is constructed once per partition (the expensive init a
    * real codec/model needs), then streamed over rows. */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        // 4x4 block means = a 16-dim pooled feature vector
        val pooled = (0 until 16).map { blk =>
          val bx = blk % 4; val by = blk / 4
          var sum = 0.0f; var n = 0
          for (y <- (by * h / 4) until ((by + 1) * h / 4);
               x <- (bx * w / 4) until ((bx + 1) * w / 4)) {
            sum += px(y * w + x); n += 1
          }
          sum / n
        }
        MediaFeatures(r.id, r.mediaType, r.bytes.length, w, h, pooled)
      }
    }
  }

  /** Bilinear resize of a row-major single-channel frame — the
    * pixel-space op a real pipeline runs between decode and feature
    * extraction. Pure math over the decoded floats, so it is exact and
    * testable without codecs; corner-aligned sampling (the
    * torchvision/PIL `align_corners=false` convention). */
  def resizeBilinear(px: Array[Float], w: Int, h: Int,
      nw: Int, nh: Int): Array[Float] = {
    val out = new Array[Float](nw * nh)
    val sx = w.toFloat / nw
    val sy = h.toFloat / nh
    var y = 0
    while (y < nh) {
      val fy = math.max(0f, math.min((y + 0.5f) * sy - 0.5f, h - 1f))
      val y0 = fy.toInt
      val y1 = math.min(y0 + 1, h - 1)
      val wy = fy - y0
      var x = 0
      while (x < nw) {
        val fx = math.max(0f, math.min((x + 0.5f) * sx - 0.5f, w - 1f))
        val x0 = fx.toInt
        val x1 = math.min(x0 + 1, w - 1)
        val wx = fx - x0
        out(y * nw + x) =
          px(y0 * w + x0) * (1 - wx) * (1 - wy) +
            px(y0 * w + x1) * wx * (1 - wy) +
            px(y1 * w + x0) * (1 - wx) * wy +
            px(y1 * w + x1) * wx * wy
        x += 1
      }
      y += 1
    }
    out
  }

  final case class ResizedFrame(id: Long, mediaType: String,
      width: Int, height: Int, pixels: Seq[Float])

  /** Decode → resize, batched per partition like [[extractFeatures]]. */
  def resized(media: Dataset[MediaRow], nw: Int, nh: Int,
      decoder: Decoder = StubDecoder): Dataset[ResizedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        ResizedFrame(r.id, r.mediaType, nw, nh,
          resizeBilinear(px, w, h, nw, nh).toSeq)
      }
    }
  }

  /** Frame sampling for video-typed rows: deterministic every-nth-byte
    * chunking standing in for keyframe extraction; 1→N rows
    * (generator-shaped, like split_multi). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.mediaType != "video" || r.bytes.isEmpty) Nil
      else r.bytes.grouped(math.max(1, r.bytes.length / everyN)).zipWithIndex
        .take(everyN).map { case (chunk, i) => (r.id, i, chunk) }.toSeq
    }.toDF("id", "frame", "frame_bytes")
  }

  /** Wrap a text-keyed table into media rows (used by tests and the
    * bench corpus, which has no real binaries). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("mediaType"),
      encode(col("text"), "UTF-8").as("bytes"),
      map(lit("source"), col("source")).as("meta"))
      .as[MediaRow]
  }
}
