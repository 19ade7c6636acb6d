package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time.
  *
  * The decode step is REAL for PNG, BMP, WAV, JPEG and AVI/MJPEG
  * video via the pure-JVM [[Codecs]]/[[Jpeg]]/[[Avi]]
  * ([[BinaryDecoder]] sniffs the magic bytes and decodes —
  * oracle-gated end to end by q123/q27/q127/q136). [[StubDecoder]]
  * remains as the zero-dependency seam for plumbing tests. The Spark-side
  * plumbing — schema, partition-sized batching, mapPartitions
  * boundary (the Scala analog of mapInPandas: one iterator per
  * partition, so decoder/codec init amortizes across the whole
  * batch) — is shared by all decoders.
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

  /** The REAL decoder: sniffs PNG / JPEG / BMP / RIFF-WAVE magic
    * bytes and decodes via the pure-JVM [[Codecs]]/[[Jpeg]] (JPEG:
    * grayscale or color, any baseline sampling, restart intervals).
    * Returns one plane:
    *   - images: multi-channel pixels collapse to Σ channels per
    *     pixel (exact small ints — 0..765 for RGB — so aggregate
    *     sums stay oracle-comparable);
    *   - WAV audio: (nSamples, 1) with the signed 16-bit samples;
    *   - AVI/MJPEG video: all frames decoded and stacked as a
    *     (w, h·F) film strip of channel sums.
    * The `mediaType` hint is ignored — the bytes are authoritative
    * (a real crawl's MIME labels lie). */
  object BinaryDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
        val (w, h, ch, px) = Codecs.decodePng(bytes)
        val plane = new Array[Float](w * h)
        var i = 0
        while (i < w * h) {
          var s = 0; var c = 0
          while (c < ch) { s += px(i * ch + c); c += 1 }
          plane(i) = s.toFloat
          i += 1
        }
        (w, h, plane)
      } else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) {
        val (w, h, ch, px) = Jpeg.decode(bytes)
        val plane = new Array[Float](w * h)
        var i = 0
        while (i < w * h) {
          var s = 0; var c = 0
          while (c < ch) { s += px(i * ch + c); c += 1 }
          plane(i) = s.toFloat
          i += 1
        }
        (w, h, plane)
      } else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8') {
        val (w, h, rgb) = Gif.decodeGif(bytes)
        val plane = new Array[Float](w * h)
        var i = 0
        while (i < w * h) {
          plane(i) = (rgb(i * 3) + rgb(i * 3 + 1) + rgb(i * 3 + 2)).toFloat
          i += 1
        }
        (w, h, plane)
      } else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
        val (w, h, rgb) = Codecs.decodeBmp(bytes)
        val plane = new Array[Float](w * h)
        var i = 0
        while (i < w * h) {
          plane(i) = (rgb(i * 3) + rgb(i * 3 + 1) + rgb(i * 3 + 2)).toFloat
          i += 1
        }
        (w, h, plane)
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I') {
        // AVI/MJPEG video: decode every frame, stack as a film strip
        // (w, h·F) of per-pixel channel sums — whole-video statistics
        // stay exactly as oracle-comparable as single images
        val (w, h, _, frames) = Avi.decodeMjpeg(bytes)
        val plane = new Array[Float](w * h * frames.length)
        var fi = 0
        while (fi < frames.length) {
          val (fw, fh, ch, px) = Jpeg.decode(frames(fi))
          require(fw == w && fh == h,
            s"frame $fi is ${fw}x$fh, container says ${w}x$h")
          val base = fi * w * h
          var i = 0
          while (i < w * h) {
            var s = 0; var c = 0
            while (c < ch) { s += px(i * ch + c); c += 1 }
            plane(base + i) = s.toFloat
            i += 1
          }
          fi += 1
        }
        (w, h * frames.length, plane)
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F') {
        val (_, ch, samples) = Codecs.decodeWav(bytes)
        val frames = samples.length / ch
        val plane = new Array[Float](frames)
        var i = 0
        while (i < frames) {
          var s = 0; var c = 0
          while (c < ch) { s += samples(i * ch + c); c += 1 }
          plane(i) = s.toFloat // channel sum, like the image planes
          i += 1
        }
        (frames, 1, plane)
      } else sys.error(
        s"unrecognized media payload (${bytes.length} bytes, " +
          s"type hint '$mediaType')")
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
        // 4x4 block means = a 16-dim pooled feature vector; a block
        // with no pixels (frames narrower/shorter than 4) pools to 0
        val pooled = (0 until 16).map { blk =>
          val bx = blk % 4; val by = blk / 4
          var sum = 0.0f; var n = 0
          for (y <- (by * h / 4) until ((by + 1) * h / 4);
               x <- (bx * w / 4) until ((bx + 1) * w / 4)) {
            sum += px(y * w + x); n += 1
          }
          if (n == 0) 0.0f else sum / n
        }
        MediaFeatures(r.id, r.mediaType, r.bytes.length, w, h, pooled)
      }
    }
  }

  final case class DecodedStats(id: Long, fmt: String, width: Int,
      height: Int, nPx: Int, pxSum: Long)

  /** Decode → whole-frame statistics, batched per partition — the
    * decode-parity form (q123): width/height and the exact integer
    * pixel/sample sum, so decode(encode(formula)) is oracle-checkable
    * against the formula recomputed in SQL. `pxSum` is exact: every
    * decoder emits whole-integer floats (≤765 for RGB planes, 16-bit
    * for audio). */
  def decodeStats(media: Dataset[MediaRow],
      decoder: Decoder = BinaryDecoder): Dataset[DecodedStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i).toLong; i += 1 }
        DecodedStats(r.id, r.mediaType, w, h, px.length, sum)
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

  /** REAL frame sampling over AVI/MJPEG payloads: parse the
    * container, keep every `everyN`-th frame by index (every MJPEG
    * frame is a keyframe), and return its raw JPEG bytes — selection
    * happens BEFORE any pixel decode, which is the whole point of
    * frame sampling at scale (decode only what survives). 1→N rows,
    * generator-shaped like split_multi; non-video rows are skipped.
    * Downstream decode composes via [[decodeStats]] /
    * [[extractFeatures]] on the emitted frames (q136). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.mediaType != "video") Nil
      else {
        val (_, _, _, frames) = Avi.decodeMjpeg(r.bytes)
        frames.iterator.zipWithIndex.collect {
          case (f, i) if i % everyN == 0 => (r.id, i, f)
        }.toSeq
      }
    }.toDF("id", "frame", "frame_bytes")
  }

  final case class ShotFrame(
      id: Long,
      frame: Int,
      /** exact integer Σ|Δ| of the decoded plane vs the previous
        * frame (0 for frame 0) */
      diff: Long,
      isKeyframe: Boolean)

  /** Shot-boundary detection — the frame sampler real video
    * pipelines use instead of every-Nth ([[sampleFrames]]): decode
    * consecutive frames, compute the exact integer sum of absolute
    * per-pixel deltas, and open a new shot wherever the diff exceeds
    * `threshold` (frame 0 always opens one). Emits one row per frame
    * with its diff and keyframe flag, so downstream can keep only
    * keyframes (decode-heavy featurization runs on shots, not
    * frames). One map-only pass per video — per-row cost linear in
    * the video length, no shuffle; at 100 TB this scales exactly
    * like the decode itself. Unlike [[sampleFrames]] the pixels must
    * be decoded here (the diff is a pixel statistic), which is why
    * the two compose: shot-sample first where boundaries matter,
    * every-Nth where they don't. */
  def videoShotBoundaries(media: Dataset[MediaRow], threshold: Long,
      decoder: Decoder = BinaryDecoder): Dataset[ShotFrame] = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.mediaType != "video") Nil
        else {
          val (_, _, _, frames) = Avi.decodeMjpeg(r.bytes)
          var prev: Array[Float] = null
          frames.iterator.zipWithIndex.map { case (fb, i) =>
            val (_, _, plane) = decoder.decode("image", fb)
            var diff = 0L
            if (prev != null) {
              require(plane.length == prev.length,
                s"frame $i geometry changed mid-video (id ${r.id})")
              var j = 0
              while (j < plane.length) {
                diff += math.abs(plane(j).toLong - prev(j).toLong)
                j += 1
              }
            }
            prev = plane
            ShotFrame(r.id, i, diff, i == 0 || diff > threshold)
          }.toVector
        }
      }
    }
  }

  final case class ImageStats(
      id: Long,
      width: Int,
      height: Int,
      /** min / max / Σ / Σ² of the per-pixel channel sums — all
        * exact integers (variance = (n·Σ² − Σ²)/n² derives without
        * another pass) */
      pxMin: Long,
      pxMax: Long,
      pxSum: Long,
      pxSumSq: Long)

  /** Whole-image quality statistics — the signals an image curation
    * pipeline filters on (blank/near-blank detection via min==max,
    * dark/blown-out via the mean, low-contrast via the exact
    * variance). One map-only pass over the decoded plane; every stat
    * is an exact integer so q139's oracle hash-matches. */
  def imageStats(media: Dataset[MediaRow],
      decoder: Decoder = BinaryDecoder): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        var mn = Long.MaxValue; var mx = Long.MinValue
        var sum = 0L; var sumSq = 0L
        var i = 0
        while (i < px.length) {
          val v = px(i).toLong
          if (v < mn) mn = v
          if (v > mx) mx = v
          sum += v; sumSq += v * v
          i += 1
        }
        ImageStats(r.id, w, h, mn, mx, sum, sumSq)
      }
    }
  }

  final case class ImageHash(id: Long, width: Int, height: Int,
      ahash: Long)

  /** 64-bit average-hash (aHash) — the standard perceptual
    * fingerprint image-dedup pipelines group on: the image divides
    * into an 8×8 grid, and bit b (row-major) is set iff block b's
    * pixel sum, scaled, exceeds the whole image's (block mean >
    * global mean, compared EXACTLY as 64·blockSum·1 > total·1 over
    * the integer channel-sum plane — no floats, no rounding, so
    * q140's oracle reproduces every bit). Dimensions must be
    * multiples of 8 (resize first via [[resizeBilinear]] otherwise —
    * kept separate so the hash itself stays exact). Identical images
    * collide by construction; near-identical ones (small noise,
    * re-encodes of the same frame) collide because per-block means
    * are stable under per-pixel jitter. Map-only; dedup composes as
    * a hash-groupBy on the result. */
  def aHash64(media: Dataset[MediaRow],
      decoder: Decoder = BinaryDecoder): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        require(w % 8 == 0 && h % 8 == 0,
          s"aHash64 needs dimensions divisible by 8, got ${w}x$h")
        val bw = w / 8; val bh = h / 8
        val blocks = new Array[Long](64)
        var total = 0L
        var i = 0
        while (i < px.length) {
          val v = px(i).toLong
          val bx = (i % w) / bw; val by = (i / w) / bh
          blocks(by * 8 + bx) += v
          total += v
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (blocks(b) * 64 > total) hash |= 1L << b
          b += 1
        }
        ImageHash(r.id, w, h, hash)
      }
    }
  }

  final case class ImageHashWide(id: Long, width: Int, height: Int,
      hash: Seq[Long])

  /** Fixed-point DCT basis: T[m] = round(2^14 · cos(π·m/32)), the 64
    * distinct values cos takes at the DCT-II sample points (period
    * 2π ⇒ index mod 64). Public-constant table — both the Scala
    * kernel and the SQL oracle read THIS array, so the two engines
    * share identical integers by construction. */
  val DctScale = 16384L
  val dctCosTable: IndexedSeq[Long] = (0 until 64).map(m =>
    Math.round(DctScale * Math.cos(Math.PI * m / 32.0)))

  /** 252-bit (PDQ-class) DCT perceptual hash computed FROM PIXELS —
    * the production-width fingerprint the wide Hamming dedup family
    * consumes (facebook/ThreatExchange's public PDQ spec is the
    * reference construction: pool → 16×16 DCT → median threshold).
    * Exact integer arithmetic end to end, so a SQL oracle replays
    * every bit:
    *
    *  1. the decoded channel-sum plane pools into a 16×16 grid of
    *     exact integer block sums (dimensions must be multiples of
    *     16 — resize first via [[resizeBilinear]], kept separate so
    *     the hash itself stays exact, same contract as [[aHash64]]);
    *  2. a 2-D DCT-II in fixed-point integer arithmetic:
    *     D[u][v] = Σ_bx Σ_by B[bx][by] · T[(u·(2bx+1)) mod 64]
    *                                   · T[(v·(2by+1)) mod 64]
    *     with the shared [[dctCosTable]] basis (separable: two 16-way
    *     passes per image);
    *  3. 252 of the 256 coefficients are kept — the DC term (0,0)
    *     carries only overall brightness and the three
    *     highest-frequency corner terms (14,15),(15,14),(15,15) carry
    *     only sub-block noise; 252 = 4·63 also leaves every packed
    *     word's sign bit clear, keeping the wide band keys and the
    *     oracle's word assembly in positive arithmetic;
    *  4. bit i is set iff its coefficient exceeds the 126th-smallest
    *     kept coefficient (the lower median — PDQ's
    *     half-the-bits-set discipline, value-deterministic under
    *     ties), packed little-endian: word i/63, bit i mod 63.
    *
    * Composes directly with [[graft.operators.Dedup
    * .imageDedupClustersWide]] (nWords = 4). Map-only, one decode +
    * 8192 multiply-adds per image. Overflow bound: |D| ≤ 256·B·2^28
    * with B ≤ 765·(w·h/256), so planes up to 2^24 pixels stay inside
    * int64 — guarded loudly. */
  def dctHash256(media: Dataset[MediaRow],
      decoder: Decoder = BinaryDecoder): Dataset[ImageHashWide] = {
    import media.sparkSession.implicits._
    val excluded = Set(0, 239, 254, 255)
    media.mapPartitions { rows =>
      val t = dctCosTable
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        require(w % 16 == 0 && h % 16 == 0,
          s"dctHash256 needs dimensions divisible by 16, got ${w}x$h")
        require(w.toLong * h <= (1L << 24),
          s"dctHash256: ${w}x$h exceeds 2^24 pixels — the int64 " +
            "overflow bound; pool or resize first")
        val bw = w / 16; val bh = h / 16
        val blocks = new Array[Long](256)
        var i = 0
        while (i < px.length) {
          blocks(((i / w) / bh) * 16 + (i % w) / bw) += px(i).toLong
          i += 1
        }
        // separable DCT: R[u][by] = Σ_bx B[by·16+bx]·T[u(2bx+1)]
        val rT = new Array[Long](256)
        var u = 0
        while (u < 16) {
          var by = 0
          while (by < 16) {
            var s = 0L; var bx = 0
            while (bx < 16) {
              s += blocks(by * 16 + bx) * t((u * (2 * bx + 1)) % 64)
              bx += 1
            }
            rT(u * 16 + by) = s
            by += 1
          }
          u += 1
        }
        val coef = new Array[Long](256)
        u = 0
        while (u < 16) {
          var v = 0
          while (v < 16) {
            var s = 0L; var by = 0
            while (by < 16) {
              s += rT(u * 16 + by) * t((v * (2 * by + 1)) % 64)
              by += 1
            }
            coef(u * 16 + v) = s
            v += 1
          }
          u += 1
        }
        val kept = new Array[Long](252)
        var idx = 0
        var uv = 0
        while (uv < 256) {
          if (!excluded(uv)) { kept(idx) = coef(uv); idx += 1 }
          uv += 1
        }
        val sorted = kept.clone()
        java.util.Arrays.sort(sorted)
        val thr = sorted(125)
        val words = new Array[Long](4)
        idx = 0
        uv = 0
        while (uv < 256) {
          if (!excluded(uv)) {
            if (coef(uv) > thr) words(idx / 63) |= 1L << (idx % 63)
            idx += 1
          }
          uv += 1
        }
        ImageHashWide(r.id, w, h, words.toSeq)
      }
    }
  }

  /** 64-bit difference-hash (dHash) — aHash's gradient sibling and
    * the variant practitioners usually prefer (brightness shifts
    * cancel in the differences): the image divides into an 8-row ×
    * 9-column grid of equal blocks, and bit r·8+c is set iff block
    * (r, c+1)'s pixel sum exceeds block (r, c)'s — an EXACT integer
    * comparison (equal block sizes make sums comparable without
    * division). Width must divide by 9 and height by 8 (resize first
    * otherwise). Composes with [[graft.operators.Dedup
    * .hammingNearDup]] exactly like [[aHash64]]. */
  def dHash64(media: Dataset[MediaRow],
      decoder: Decoder = BinaryDecoder): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decoder.decode(r.mediaType, r.bytes)
        require(w % 9 == 0 && h % 8 == 0,
          s"dHash64 needs width%9==0 and height%8==0, got ${w}x$h")
        val bw = w / 9; val bh = h / 8
        val blocks = new Array[Long](72)
        var i = 0
        while (i < px.length) {
          val bx = (i % w) / bw; val by = (i / w) / bh
          blocks(by * 9 + bx) += px(i).toLong
          i += 1
        }
        var hash = 0L
        var rI = 0
        while (rI < 8) {
          var c = 0
          while (c < 8) {
            if (blocks(rI * 9 + c + 1) > blocks(rI * 9 + c))
              hash |= 1L << (rI * 8 + c)
            c += 1
          }
          rI += 1
        }
        ImageHash(r.id, w, h, hash)
      }
    }
  }

  final case class AudioFrameFeatures(
      id: Long,
      frame: Int,
      /** samples in this frame (the tail frame may be short) */
      n: Int,
      /** Σ v² over the integer mono downmix — exact */
      energy: Long,
      /** strict sign flips between consecutive samples */
      zeroCrossings: Int,
      /** max |v| */
      peak: Int,
      /** lag-1 autocorrelation Σ v_j·v_{j+1} — exact (the classic
        * integer pitch/voicing feature) */
      ac1: Long)

  final case class AudioSpectral(
      id: Long,
      frame: Int,
      n: Int,
      /** Goertzel bin powers at w = π/3, π/2, 2π/3 (bins fs/6, fs/4,
        * fs/3) — exact integers */
      ePi3: Long,
      ePi2: Long,
      e2Pi3: Long)

  /** Exact-integer single-bin spectral energies via the Goertzel
    * recurrence (a public textbook algorithm): for the three angular
    * frequencies whose coefficient 2·cos(w) is an INTEGER — w = π/3
    * (c = 1), π/2 (c = 0), 2π/3 (c = −1), i.e. bins at fs/6, fs/4,
    * fs/3 — the recurrence s[n] = x[n] + c·s[n−1] − s[n−2] stays in
    * exact integer arithmetic, and the bin power |X|² = s₁² + s₂² −
    * c·s₁·s₂ is an exact integer too, so — unlike a float FFT — the
    * oracle can recompute it bit for bit (q149). Framing, downmix,
    * and the map-only scale contract exactly as
    * [[audioFrameFeatures]]. Magnitudes: |s| ≤ frameSize·maxAmp
    * (|c| ≤ 1), so 16-bit audio at any sane frame size stays far
    * inside int64. */
  def audioSpectral(media: Dataset[MediaRow],
      frameSize: Int): Dataset[AudioSpectral] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    import media.sparkSession.implicits._
    val coeffs = Array(1, 0, -1)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, ch, samples) = Codecs.decodeWav(r.bytes)
        val nSamp = samples.length / ch
        val mono = new Array[Int](nSamp)
        var i = 0
        while (i < nSamp) {
          var s = 0; var c = 0
          while (c < ch) { s += samples(i * ch + c); c += 1 }
          mono(i) = s
          i += 1
        }
        val out = Seq.newBuilder[AudioSpectral]
        var start = 0
        var fi = 0
        while (start < mono.length) {
          val end = math.min(start + frameSize, mono.length)
          val e = new Array[Long](coeffs.length)
          var k = 0
          while (k < coeffs.length) {
            val c = coeffs(k)
            var s1 = 0L; var s2 = 0L
            var j = start
            while (j < end) {
              val s0 = mono(j) + c * s1 - s2
              s2 = s1; s1 = s0
              j += 1
            }
            e(k) = s1 * s1 + s2 * s2 - c * s1 * s2
            k += 1
          }
          out += AudioSpectral(r.id, fi, end - start, e(0), e(1), e(2))
          start = end
          fi += 1
        }
        out.result()
      }
    }
  }

  /** Frame-level audio features over PCM WAV payloads — the audio
    * analog of image feature extraction, and the statistics an audio
    * curation pipeline filters on (silence/clipping detection, voiced
    * ratio). REAL decode via [[Codecs.decodeWav]]; multi-channel
    * audio downmixes by integer channel SUM (no division — every
    * feature stays an exact integer, so q137's oracle hash-matches).
    * Frames are non-overlapping windows of `frameSize` samples, the
    * tail kept short. Map-only: one pass per payload, no shuffle —
    * the per-row cost is linear in the audio length and the operator
    * scales exactly like decode itself. 1→N rows, generator-shaped. */
  def audioFrameFeatures(media: Dataset[MediaRow],
      frameSize: Int): Dataset[AudioFrameFeatures] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, ch, samples) = Codecs.decodeWav(r.bytes)
        val nFrames0 = samples.length / ch
        val mono = new Array[Int](nFrames0)
        var i = 0
        while (i < nFrames0) {
          var s = 0; var c = 0
          while (c < ch) { s += samples(i * ch + c); c += 1 }
          mono(i) = s
          i += 1
        }
        val out = Seq.newBuilder[AudioFrameFeatures]
        var start = 0
        var fi = 0
        while (start < mono.length) {
          val end = math.min(start + frameSize, mono.length)
          var energy = 0L; var zc = 0; var peak = 0; var ac1 = 0L
          var j = start
          while (j < end) {
            val v = mono(j)
            energy += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (j > start) {
              val pv = mono(j - 1)
              if (pv.toLong * v < 0) zc += 1
              ac1 += pv.toLong * v
            }
            j += 1
          }
          out += AudioFrameFeatures(r.id, fi, end - start, energy, zc,
            peak, ac1)
          start = end
          fi += 1
        }
        out.result()
      }
    }
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
