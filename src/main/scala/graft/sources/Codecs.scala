package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs — the REAL decode step behind
  * [[Multimodal.BinaryDecoder]], written from the public format
  * specifications (no native or third-party codec libraries, in this
  * repo's from-scratch style — the same discipline as the protobuf
  * wire reader in [[OsmPbf]]):
  *
  *   - PNG (W3C PNG / RFC 2083): 8-bit greyscale / RGB / RGBA,
  *     non-interlaced; zlib via `java.util.zip` (the same Inflater
  *     path OsmPbf uses); all five scanline filters (None, Sub, Up,
  *     Average, Paeth) on both encode and decode — the encoder cycles
  *     filter types per row so round-trip tests exercise every
  *     unfilter branch.
  *   - BMP (Windows BITMAPFILEHEADER + BITMAPINFOHEADER): 24-bit
  *     uncompressed BI_RGB, bottom-up rows, BGR byte order, rows
  *     padded to 4 bytes.
  *   - WAV (RIFF/WAVE): 16-bit little-endian PCM, mono.
  *
  * Everything is exact integer math (samples/pixels 0..255 or
  * 16-bit), so decode(encode(x)) == x bit for bit and aggregate sums
  * are oracle-comparable cross-engine (q123). */
object Codecs {

  // ------------------------------------------------------------------
  // PNG
  // ------------------------------------------------------------------

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    val c = crc.getValue
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per the
    * spec's pixel-extraction pattern; pass order is normative. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** The (xStart, yStart, xStep, yStep) sub-image list for an
    * interlace method: one full-image pass for none, the seven Adam7
    * passes otherwise (empty passes are filtered by the callers). */
  private def passes(interlaced: Boolean): Array[(Int, Int, Int, Int)] =
    if (interlaced) Adam7 else Array((0, 0, 1, 1))

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Filter one (sub-)image's scanlines at the BYTE level (per spec:
    * the filters operate on bytes with bpp = bytes per complete
    * pixel, regardless of bit depth). `filterOf(row)` picks the
    * per-row filter type; the encoder cycles 0..4 so round-trips
    * exercise every unfilter branch. */
  private def filterRegion(grid: Array[Byte], rows: Int, rowBytes: Int,
      bpp: Int, out: java.io.ByteArrayOutputStream): Unit = {
    var y = 0
    while (y < rows) {
      val ft = y % 5
      out.write(ft)
      var x = 0
      while (x < rowBytes) {
        val cur = grid(y * rowBytes + x) & 0xff
        val left = if (x >= bpp) grid(y * rowBytes + x - bpp) & 0xff else 0
        val up = if (y > 0) grid((y - 1) * rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          grid((y - 1) * rowBytes + x - bpp) & 0xff else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        out.write(filt & 0xff)
        x += 1
      }
      y += 1
    }
  }

  /** Unfilter one (sub-)image region in place from `raw` (rows ×
    * (1 + rowBytes), starting at `off`) → recon bytes. */
  private def unfilterRegion(raw: Array[Byte], off: Int, rows: Int,
      rowBytes: Int, bpp: Int): Array[Byte] = {
    val recon = new Array[Byte](rows * rowBytes)
    var y = 0
    while (y < rows) {
      val ft = raw(off + y * (rowBytes + 1)) & 0xff
      var x = 0
      while (x < rowBytes) {
        val filt = raw(off + y * (rowBytes + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) recon(y * rowBytes + x - bpp) & 0xff else 0
        val up = if (y > 0) recon((y - 1) * rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          recon((y - 1) * rowBytes + x - bpp) & 0xff else 0
        val r = ft match {
          case 0 => filt
          case 1 => filt + left
          case 2 => filt + up
          case 3 => filt + ((left + up) >> 1)
          case 4 => filt + paeth(left, up, ul)
          case t => sys.error(s"unknown filter type $t")
        }
        recon(y * rowBytes + x) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    recon
  }

  /** Encode an image; `channels` 1 (grey), 3 (RGB) or 4 (RGBA); `px`
    * row-major channel-interleaved samples (0..255 at depth 8,
    * 0..65535 at depth 16), length w·h·channels. Supports bit depth
    * 8/16 and Adam7 interlacing — the full decoder surface, so
    * round-trip tests cover every branch. */
  def encodePng(w: Int, h: Int, channels: Int, px: Array[Int],
      bitDepth: Int = 8, interlaced: Boolean = false): Array[Byte] = {
    require(px.length == w * h * channels,
      s"pixel buffer ${px.length} != $w*$h*$channels")
    require(bitDepth == 8 || bitDepth == 16, s"bad bit depth $bitDepth")
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case n => sys.error(s"unsupported channel count $n")
    }
    val bytesPerSample = bitDepth / 8
    val bpp = channels * bytesPerSample
    val raw = new java.io.ByteArrayOutputStream()
    passes(interlaced).foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) ceilDiv(w - x0, dx) else 0
      val ph = if (h > y0) ceilDiv(h - y0, dy) else 0
      if (pw > 0 && ph > 0) {
        val grid = new Array[Byte](ph * pw * bpp)
        for (py <- 0 until ph; pxi <- 0 until pw; c <- 0 until channels) {
          val v = px(((y0 + py * dy) * w + (x0 + pxi * dx)) * channels + c)
          val o = (py * pw + pxi) * bpp + c * bytesPerSample
          if (bytesPerSample == 2) {
            grid(o) = (v >>> 8).toByte; grid(o + 1) = v.toByte
          } else grid(o) = v.toByte
        }
        filterRegion(grid, ph, pw * bpp, bpp, raw)
      }
    }
    val deflater = new Deflater()
    deflater.setInput(raw.toByteArray)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature)
    val ihdr = Array(
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte,
      (if (interlaced) 1 else 0).toByte)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Decode a PNG: (width, height, channels, samples row-major
    * channel-interleaved — 0..255 at depth 8, 0..65535 at depth 16).
    * Supports bit depths 8/16, color types 0/2/6, interlace none AND
    * Adam7; multiple IDAT chunks are concatenated per the spec. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    require(bytes.length > 8 &&
      PngSignature.indices.forall(i => bytes(i) == PngSignature(i)),
      "not a PNG (bad signature)")
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    var depth = 0; var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (off + 8 <= bytes.length && !seenEnd) {
      val len = be32(bytes, off)
      val typ = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
      // a corrupt/malicious length must fail loudly, not wedge the
      // walker (negative len would stop `off` from advancing) or read
      // out of bounds — these are real-crawl bytes
      require(len >= 0, s"negative chunk length $len for $typ")
      require(off + 8 + len.toLong + 4 <= bytes.length,
        s"truncated chunk $typ")
      typ match {
        case "IHDR" =>
          w = be32(bytes, off + 8)
          h = be32(bytes, off + 12)
          depth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          interlace = bytes(off + 20) & 0xff
          require(depth == 8 || depth == 16,
            s"unsupported bit depth $depth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"unsupported color type $colorType")
          require(interlace == 0 || interlace == 1,
            s"unknown interlace method $interlace")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => seenEnd = true
        case _      => () // ancillary chunks skipped
      }
      off += 8 + len + 4
    }
    require(seenEnd, "missing IEND")
    // an IEND-before-IHDR stream would otherwise reach the channels
    // match with colorType = -1 and die with an opaque MatchError
    require(colorType >= 0 && w > 0, "missing IHDR")
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
    }
    val bytesPerSample = depth / 8
    val bpp = channels * bytesPerSample
    require(w > 0 && h > 0 &&
      (w.toLong * bpp + 1) * h < Int.MaxValue,
      s"bad PNG dimensions ${w}x$h")
    val passList = passes(interlace == 1).map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) ceilDiv(w - x0, dx) else 0
      val ph = if (h > y0) ceilDiv(h - y0, dy) else 0
      (x0, y0, dx, dy, pw, ph)
    }.filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }
    val rawLen = passList.map { case (_, _, _, _, pw, ph) =>
      ph * (1 + pw * bpp)
    }.sum
    val raw = new Array[Byte](rawLen)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      // n == 0 while unfinished means truncated input OR an
      // unsupported preset-dictionary stream — either way looping
      // again would spin forever
      require(n > 0, "truncated or unsupported IDAT zlib stream")
      got += n
    }
    inflater.end()
    require(got == raw.length, s"inflated $got of ${raw.length} bytes")
    val px = new Array[Int](w * h * channels)
    var rawOff = 0
    passList.foreach { case (x0, y0, dx, dy, pw, ph) =>
      val recon = unfilterRegion(raw, rawOff, ph, pw * bpp, bpp)
      rawOff += ph * (1 + pw * bpp)
      for (py <- 0 until ph; pxi <- 0 until pw; c <- 0 until channels) {
        val o = (py * pw + pxi) * bpp + c * bytesPerSample
        val v =
          if (bytesPerSample == 2)
            ((recon(o) & 0xff) << 8) | (recon(o + 1) & 0xff)
          else recon(o) & 0xff
        px(((y0 + py * dy) * w + (x0 + pxi * dx)) * channels + c) = v
      }
    }
    (w, h, channels, px)
  }

  // ------------------------------------------------------------------
  // BMP (24-bit BI_RGB)
  // ------------------------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Encode a 24-bit uncompressed BMP; `rgb` row-major top-down
    * (r,g,b per pixel, 0..255), length w·h·3. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"pixel buffer ${rgb.length} != $w*$h*3")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * h
    val fileSize = 54 + imageSize
    val out = new java.io.ByteArrayOutputStream(fileSize)
    out.write('B'); out.write('M')
    out.write(le32(fileSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)) // BITMAPINFOHEADER
    out.write(le32(w)); out.write(le32(h)) // positive height = bottom-up
    out.write(le16(1)); out.write(le16(24))
    out.write(le32(0)) // BI_RGB
    out.write(le32(imageSize))
    out.write(le32(2835)); out.write(le32(2835)) // 72 dpi
    out.write(le32(0)); out.write(le32(0))
    var y = h - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out.write(rgb(o + 2)); out.write(rgb(o + 1)); out.write(rgb(o))
        x += 1
      }
      var p = 0
      while (p < pad) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decode a 24-bit BI_RGB BMP (top-down or bottom-up) →
    * (width, height, rgb row-major top-down). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP (bad magic)")
    val dataOffset = readLe32(bytes, 10)
    val headerSize = readLe32(bytes, 14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    require(bpp == 24, s"unsupported BMP bpp $bpp")
    require(compression == 0, s"unsupported BMP compression $compression")
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$hRaw")
    require(dataOffset >= 54, s"bad BMP data offset $dataOffset")
    val rowBytes = w * 3
    val padded = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOffset + padded.toLong * h <= bytes.length,
      "truncated BMP")
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      var x = 0
      while (x < w) {
        val so = dataOffset + srcRow * padded + x * 3
        val o = (y * w + x) * 3
        rgb(o) = bytes(so + 2) & 0xff     // R
        rgb(o + 1) = bytes(so + 1) & 0xff // G
        rgb(o + 2) = bytes(so) & 0xff     // B
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  // ------------------------------------------------------------------
  // WAV (16-bit PCM mono)
  // ------------------------------------------------------------------

  /** Encode 16-bit signed PCM samples (−32768..32767); multi-channel
    * input is frame-interleaved (L R L R … for stereo), length a
    * multiple of `channels`. */
  def encodeWav(samples: Array[Int], sampleRate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels")
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    out.write(le32(36 + dataSize))
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2 * channels))
    out.write(le16(2 * channels)) // block align
    out.write(le16(16))
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    out.write(le32(dataSize))
    samples.foreach { s =>
      require(s >= -32768 && s <= 32767, s"sample $s out of 16-bit range")
      out.write(s & 0xff); out.write((s >>> 8) & 0xff)
    }
    out.toByteArray
  }

  /** Decode a 16-bit PCM WAV → (sampleRate, channels, samples
    * frame-interleaved). Walks the RIFF chunk list, so extra chunks
    * (LIST/fact) are skipped. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WAVE",
      "not a WAV (bad RIFF/WAVE magic)")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Int] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      val len = readLe32(bytes, off + 4)
      // same walker discipline as the PNG chunks: a corrupt length
      // must throw, never wedge the loop or index out of bounds
      require(len >= 0, s"negative RIFF chunk length $len for '$id'")
      require(off + 8 + len.toLong <= bytes.length,
        s"truncated RIFF chunk '$id'")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len bytes)")
          val fmt = readLe16(bytes, off + 8)
          val ch = readLe16(bytes, off + 10)
          val bits = readLe16(bytes, off + 22)
          require(fmt == 1, s"unsupported WAV format $fmt (want PCM)")
          require(ch >= 1, s"bad channel count $ch")
          require(bits == 16, s"unsupported bit depth $bits")
          channels = ch
          sampleRate = readLe32(bytes, off + 12)
        case "data" =>
          val n = len / 2
          samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            val lo = bytes(off + 8 + i * 2) & 0xff
            val hi = bytes(off + 8 + i * 2 + 1)
            samples(i) = (hi << 8) | lo // sign-extends through hi
            i += 1
          }
        case _ => ()
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, channels, samples)
  }
}
