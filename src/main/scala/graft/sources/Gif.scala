package graft.sources

import java.nio.charset.StandardCharsets

/** GIF codec — pure JVM, written from the public GIF87a/89a
  * specification (CompuServe, 1987/1989): logical screen descriptor,
  * global color table, image descriptor, four-pass row interlace,
  * and REAL LZW with variable code width (9→12 bits), clear/EOI
  * codes, dictionary reset at 4096, and the ≤255-byte sub-block
  * framing. GIF is lossless and palette-based, so — unlike JPEG —
  * ANY pixel pattern round-trips bit-exactly (q138 gates arbitrary
  * formula images, not a restricted family).
  *
  * Encoder: builds an exact palette from the image's distinct colors
  * (≤256 required — the format's own limit), padded to a power-of-two
  * table as the spec requires; standard LZW string-table compression
  * with the canonical code-width growth rule. Decoder: skips 89a
  * extension blocks (GCE/comment/application), handles the KwKwK
  * self-referential code case, de-interlaces, maps palette → RGB.
  * Same corrupt-input discipline as [[Codecs]].
  */
object Gif {

  private val interlacePasses: Array[(Int, Int)] =
    Array((0, 8), (4, 8), (2, 4), (1, 2)) // (start row, step)

  // ---- encode ----

  /** Encode an RGB image (triplets, length w·h·3, each 0..255) as
    * GIF87a (or 89a framing-compatible; no extensions written). The
    * image must have ≤256 distinct colors — the format's palette
    * limit; more throws. */
  def encodeGif(w: Int, h: Int, rgb: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff,
      s"bad dimensions ${w}x$h")
    require(rgb.length == w * h * 3,
      s"expected ${w * h * 3} rgb values, got ${rgb.length}")
    require(rgb.forall(v => v >= 0 && v <= 255), "rgb value out of range")

    // exact palette: distinct colors in first-appearance order (a
    // deterministic choice; decoders only see indices)
    val paletteIdx = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    val indices = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val c = (rgb(3 * i) << 16) | (rgb(3 * i + 1) << 8) | rgb(3 * i + 2)
      indices(i) = paletteIdx.getOrElseUpdate(c, paletteIdx.size)
      i += 1
    }
    require(paletteIdx.size <= 256,
      s"${paletteIdx.size} distinct colors exceed GIF's 256-color palette")
    // color table size must be a power of two ≥ 2 (spec: 2^(n+1))
    var tableBits = 1
    while ((1 << tableBits) < paletteIdx.size) tableBits += 1
    val tableSize = 1 << tableBits
    // LZW minimum code size is ≥ 2 by spec
    val minCode = math.max(2, tableBits)

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes(StandardCharsets.US_ASCII))
    // logical screen descriptor
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0x80 | ((tableBits - 1) << 4) | (tableBits - 1)) // GCT flag
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    // global color table
    val colors = paletteIdx.keys.toArray
    var c = 0
    while (c < tableSize) {
      if (c < colors.length) {
        out.write((colors(c) >>> 16) & 0xff)
        out.write((colors(c) >>> 8) & 0xff)
        out.write(colors(c) & 0xff)
      } else { out.write(0); out.write(0); out.write(0) }
      c += 1
    }
    // image descriptor
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(if (interlaced) 0x40 else 0x00)

    // interlace = writing rows in pass order
    val ordered =
      if (!interlaced) indices
      else {
        val o = new Array[Int](w * h)
        var pos = 0
        interlacePasses.foreach { case (start, step) =>
          var y = start
          while (y < h) {
            System.arraycopy(indices, y * w, o, pos, w)
            pos += w
            y += step
          }
        }
        o
      }

    out.write(minCode)
    out.write(lzwCompress(ordered, minCode))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Standard GIF LZW: variable code width starting at minCode+1,
    * widening when the next free slot crosses a power of two, table
    * reset via CLEAR at 4096; output framed into ≤255-byte
    * sub-blocks terminated by a zero block. */
  private def lzwCompress(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val raw = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def put(code: Int, width: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        raw.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }

    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = eoi + 1
    var width = minCode + 1
    def reset(): Unit = { dict = dict.empty; next = eoi + 1; width = minCode + 1 }

    put(clear, width)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val p = indices(i)
      dict.get((cur, p)) match {
        case Some(code) => cur = code
        case None =>
          put(cur, width)
          if (next < 4096) {
            dict((cur, p)) = next
            // widen when the JUST-ASSIGNED code fills the width
            if (next == (1 << width) && width < 12) width += 1
            next += 1
          } else {
            put(clear, width)
            reset()
          }
          cur = p
      }
      i += 1
    }
    put(cur, width)
    // The decoder assigns one more dictionary slot AFTER reading the
    // final data code (prefix = previous string, first pixel of cur)
    // and widens when that slot lands on (1 << width) - 1 — i.e. when
    // our next-free counter equals 1 << width. EOI must be written at
    // the width the decoder will READ it at, so mirror that phantom
    // assignment here. (No phantom when the final code was the first
    // after clear/start: there next == eoi + 1 = 2^minCode + 2, which
    // can never equal 2^(minCode+1) for the spec minimum minCode ≥ 2;
    // and at a full table width is already 12, so the < 12 guard
    // matches the decoder's skipped assignment.)
    if (next == (1 << width) && width < 12) width += 1
    put(eoi, width)
    if (bitCnt > 0) raw.write((bitBuf & 0xff).toInt)

    val bytes = raw.toByteArray
    val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n)
      out.write(bytes, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.toByteArray
  }

  // ---- decode ----

  /** Decode a GIF → (w, h, rgb triplets). Global color table
    * required (local tables and multi-image animations are out of
    * scope — the first image block is the result, matching how
    * training pipelines treat animated GIFs as their first frame);
    * 89a extension blocks are skipped. */
  def decodeGif(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 13, "GIF too short")
    val magic = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    require(magic == "GIF87a" || magic == "GIF89a",
      s"not a GIF (header '$magic')")
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "missing global color table")
    val gctSize = 2 << (packed & 7)
    var off = 13
    require(off + 3 * gctSize <= bytes.length, "truncated color table")
    val palette = new Array[Int](gctSize * 3)
    var c = 0
    while (c < gctSize * 3) { palette(c) = bytes(off + c) & 0xff; c += 1 }
    off += 3 * gctSize

    // block loop: skip extensions until the first image descriptor
    while (off < bytes.length && (bytes(off) & 0xff) == 0x21) {
      off += 2 // extension introducer + label
      while ({
        require(off < bytes.length, "truncated extension block")
        val n = bytes(off) & 0xff
        off += 1 + n
        n != 0
      }) ()
    }
    require(off < bytes.length && (bytes(off) & 0xff) == 0x2c,
      "missing image descriptor")
    val ix = u16(off + 1); val iy = u16(off + 3)
    val iw = u16(off + 5); val ih = u16(off + 7)
    val iPacked = bytes(off + 9) & 0xff
    require((iPacked & 0x80) == 0, "local color tables unsupported")
    val interlaced = (iPacked & 0x40) != 0
    require(ix == 0 && iy == 0 && iw == sw && ih == sh,
      s"sub-rectangle image (${iw}x$ih at $ix,$iy of ${sw}x$sh) unsupported")
    off += 10

    require(off < bytes.length, "missing LZW minimum code size")
    val minCode = bytes(off) & 0xff
    require(minCode >= 2 && minCode <= 11, s"bad LZW min code size $minCode")
    off += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while ({
      require(off < bytes.length, "truncated image data")
      val n = bytes(off) & 0xff
      require(off + 1 + n <= bytes.length, "truncated image sub-block")
      data.write(bytes, off + 1, n)
      off += 1 + n
      n != 0
    }) ()

    val indices = lzwDecompress(data.toByteArray, minCode, sw * sh)
    // de-interlace
    val ordered =
      if (!interlaced) indices
      else {
        val o = new Array[Int](sw * sh)
        var pos = 0
        interlacePasses.foreach { case (start, step) =>
          var y = start
          while (y < sh) {
            System.arraycopy(indices, pos, o, y * sw, sw)
            pos += sw
            y += step
          }
        }
        o
      }
    val rgb = new Array[Int](sw * sh * 3)
    var i = 0
    while (i < sw * sh) {
      val p = ordered(i)
      require(p < gctSize, s"pixel index $p exceeds color table $gctSize")
      rgb(3 * i) = palette(3 * p)
      rgb(3 * i + 1) = palette(3 * p + 1)
      rgb(3 * i + 2) = palette(3 * p + 2)
      i += 1
    }
    (sw, sh, rgb)
  }

  /** Standard GIF LZW decode, including the KwKwK case (a code equal
    * to the next unassigned slot means "previous string + its own
    * first pixel"). The lagging-table decoder widens one slot earlier
    * than the encoder's counter (the classic off-by-one: the decoder
    * materializes entries one code behind), keeping the bit widths in
    * lockstep. */
  private def lzwDecompress(data: Array[Byte], minCode: Int,
      nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](nPixels)
    var outPos = 0

    // dictionary as (prefix code, last pixel); roots are implicit
    val prefix = new Array[Int](4096)
    val last = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1

    // chain-walk scratch, shared by every emit() below: a dictionary
    // chain is at most 4096 deep, and allocating this per CODE was
    // ~3 MB of garbage per small image — enough to GC-stall a
    // 32-task decode stage on a heap already holding checkpoint
    // blocks (round-16 q144 triage)
    val stack = new Array[Int](4096)
    // walk the chain, write reversed — returns the first pixel
    def emit(code0: Int): Int = {
      var code = code0
      var sp = 0
      while (code >= clear + 2) {
        stack(sp) = last(code); sp += 1
        code = prefix(code)
      }
      require(code < clear, s"LZW chain ends in special code $code")
      val first = code
      require(outPos + 1 + sp <= nPixels,
        s"LZW stream overruns the ${nPixels}-pixel image")
      out(outPos) = first; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }

    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done) {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      if (bitCnt < width) {
        // Bit exhaustion with every pixel already decoded = implicit
        // EOI: tolerated (defensively — real-world encoders exist
        // that miscount the EOI width; a truncated PAYLOAD still
        // fails the pixel-count check below).
        require(outPos == nPixels, "truncated LZW stream (no EOI)")
        done = true
      } else {
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width

      if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"first code $code is not a root")
        out(outPos) = code; outPos += 1
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table size $next")
        val first =
          if (code == next) { // KwKwK: not yet in the table
            require(next < 4096, "KwKwK at full table")
            // emit string(prev) + its own first pixel
            val f = emit(prev)
            require(outPos + 1 <= nPixels,
              s"LZW stream overruns the ${nPixels}-pixel image")
            out(outPos) = f; outPos += 1
            f
          } else emit(code)
        if (next < 4096) {
          prefix(next) = prev; last(next) = first
          if (next == (1 << width) - 1 && width < 12) width += 1
          next += 1
        }
        prev = code
      }
      }
    }
    require(outPos == nPixels,
      s"LZW decoded $outPos pixels, image needs $nPixels")
    out
  }
}
