package graft.sources

/** Baseline sequential JPEG (ITU-T T.81), pure JVM, written from the
  * published standard in the repo's from-scratch style — the lossy
  * member of the [[Codecs]] family. Grayscale AND color (YCbCr,
  * 4:4:4 / 4:2:0 or any spec-legal sampling factors).
  *
  * Decoder: general for baseline files — canonical Huffman tables are
  * built from the file's own DHT segments (any spec-legal tables, not
  * just ours), DQT dequantization, zigzag (table GENERATED from the
  * diagonal-walk definition, not transcribed), 0xFF00 byte
  * unstuffing, restart intervals (DRI + RSTn with DC-predictor reset
  * and byte realignment), interleaved multi-component MCUs with
  * per-component sampling factors, box chroma upsampling, JFIF
  * YCbCr→RGB, exact float IDCT with round-and-clamp. Encoder:
  * single-component or 3-component SOF0 with self-defined uniform
  * 9-bit canonical Huffman tables carried in DHT (legal — JPEG files
  * declare their tables; uniform lengths trade a few bytes for a
  * table that cannot be mistranscribed), optional restart intervals.
  *
  * Exactness contract (what the q127/q128 oracles lean on): an image
  * of FLAT 8×8 blocks with even sample values round-trips EXACTLY —
  * the FDCT of a flat block is DC-only (AC terms cancel exactly,
  * also in float), DC = 8·(v−128) is divisible by the standard
  * luminance quantizer q(0,0)=16 when v is even, and the IDCT of a
  * DC-only block is the flat value back (division by a power of
  * two). The COLOR path preserves this on the grey axis: R=G=B=v
  * maps to Y=v, Cb=Cr=128 exactly (the JFIF matrix rows sum to
  * 1/0/0), flat-128 chroma has DC diff 0 under ANY quantizer, box
  * up/downsampling of a constant plane is that constant, and the
  * inverse transform at Cb=Cr=128 is the identity — so flat even
  * grey blocks survive encodeColor→decode bit-exactly at every
  * sampling factor. Arbitrary images round-trip within a small
  * bounded error (spec'd) — that is JPEG's nature, so the hash-gated
  * oracles use the exact subsets and ScalaTest covers the lossy AC /
  * chroma paths with tolerance bounds. */
object Jpeg {

  // ---- zigzag, generated from the diagonal-walk definition ----
  private[graft] val Zigzag: Array[Int] = {
    val order = new Array[Int](64)
    var k = 0
    for (s <- 0 to 14) {
      val range =
        if (s % 2 == 1) (math.max(0, s - 7) to math.min(s, 7))
        else (math.min(s, 7) to math.max(0, s - 7) by -1)
      range.foreach { r => order(k) = r * 8 + (s - r); k += 1 }
    }
    order
  }

  /** Standard luminance quantization table (T.81 Annex K.1), row
    * major. q(0,0)=16 is the DC step the exactness contract divides. */
  private[graft] val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Standard chrominance quantization table (T.81 Annex K.2), row
    * major. Chroma DC of a flat-128 plane is 0 regardless of step —
    * the grey-axis exactness never depends on these values. */
  private[graft] val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** All-ones table: maximal-fidelity mode for the lossy-path bound
    * tests (error ≤ rounding of the DCT round trip). */
  private[graft] val UnitQ: Array[Int] = Array.fill(64)(1)

  private val CosTbl: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
    t
  }
  private def cScale(u: Int) = if (u == 0) 1.0 / math.sqrt(2) else 1.0

  private def ceilDiv(a: Int, b: Int) = (a + b - 1) / b
  private def clamp255(v: Int) = math.max(0, math.min(255, v))

  // ---- bit I/O with 0xFF00 stuffing ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(value: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s per spec
      write(0xff, 8 - nBits)
    }
  }

  private final class BitReader(bytes: Array[Byte], var off: Int) {
    private var acc = 0
    private var nBits = 0
    def read(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        if (nBits == 0) {
          require(off < bytes.length, "truncated entropy stream")
          var b = bytes(off) & 0xff
          off += 1
          if (b == 0xff) {
            require(off < bytes.length, "truncated after 0xFF")
            val m = bytes(off) & 0xff
            if (m == 0x00) off += 1 // stuffed data byte
            else b = 0xff // hit a marker mid-read: spec padding only
          }
          acc = b; nBits = 8
        }
        v = (v << 1) | ((acc >>> (nBits - 1)) & 1)
        nBits -= 1
        i += 1
      }
      v
    }
    /** Restart boundary: discard padding bits, then consume the RSTn
      * marker (whose index must cycle as expected). A padding byte
      * that came out 0xFF was stuffed by the writer — skip the pair
      * if the bit consumer never touched it. */
    def expectRestart(idx: Int): Unit = {
      nBits = 0 // byte-align: the rest of acc is 1-padding
      while (off + 1 < bytes.length && (bytes(off) & 0xff) == 0xff &&
          (bytes(off + 1) & 0xff) == 0x00) off += 2 // unread stuffed pad
      require(off + 2 <= bytes.length, "truncated at restart marker")
      val m = bytes(off + 1) & 0xff
      require((bytes(off) & 0xff) == 0xff && (m & 0xf8) == 0xd0,
        f"expected restart marker, got 0x${bytes(off) & 0xff}%02x$m%02x")
      require((m & 0x07) == idx,
        s"restart marker out of sequence: RST${m & 0x07}, expected RST$idx")
      off += 2
    }
  }

  // ---- canonical Huffman ----

  /** (counts per length 1..16, symbols in order) → decode tables as
    * (firstCode, firstIndex) per length, per T.81's canonical
    * construction. */
  private final class HuffTable(counts: Array[Int], syms: Array[Int]) {
    require(counts.length == 16)
    // encode side: symbol -> (code, length)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    // decode side
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        for (_ <- 0 until counts(l - 1)) {
          codeOf(syms(k)) = code
          lenOf(syms(k)) = l
          code += 1; k += 1
        }
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | in.read(1)
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return syms(valPtr(l) + (code - minCode(l)))
      }
      sys.error("invalid Huffman code")
    }
  }

  /** Uniform 9-bit canonical table over the given symbols: with ≤256
    * symbols every 9-bit code fits and the all-ones code stays
    * unused, as the spec requires. */
  private def uniformTable(syms: Array[Int]): (Array[Int], Array[Int]) = {
    require(syms.length <= 256)
    val counts = new Array[Int](16)
    counts(8) = syms.length // length 9 (index 8 = length-1)
    (counts, syms)
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- shared block kernels ----

  /** FDCT + quantize the 8×8 block of `plane` (pw×ph, edge
    * replication beyond the plane) at (px0, py0) into `coef`
    * (natural row-major order). */
  private def fdctQuant(plane: Array[Int], pw: Int, ph: Int,
      px0: Int, py0: Int, qtable: Array[Int], coef: Array[Int]): Unit = {
    for (u <- 0 until 8; v <- 0 until 8) {
      var sum = 0.0
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = math.min(py0 + y, ph - 1)
        val sx = math.min(px0 + x, pw - 1)
        sum += (plane(sy * pw + sx) - 128) *
          CosTbl(x * 8 + u) * CosTbl(y * 8 + v)
      }
      val f = 0.25 * cScale(u) * cScale(v) * sum
      coef(v * 8 + u) = math.round(f / qtable(v * 8 + u)).toInt
    }
  }

  /** Entropy-encode one quantized block; returns the new DC
    * predictor. */
  private def writeBlock(bw: BitWriter, dcT: HuffTable, acT: HuffTable,
      coef: Array[Int], prevDc: Int): Int = {
    def emit(t: HuffTable, sym: Int): Unit =
      bw.write(t.codeOf(sym), t.lenOf(sym))
    def emitValue(v: Int, s: Int): Unit =
      if (s > 0) bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
    val dc = coef(0)
    val diff = dc - prevDc
    val s = category(diff)
    emit(dcT, s); emitValue(diff, s)
    // AC run-length over zigzag order
    var run = 0
    var lastNz = 0
    for (k <- 1 until 64) if (coef(Zigzag(k)) != 0) lastNz = k
    for (k <- 1 to lastNz) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { emit(acT, 0xf0); run -= 16 } // ZRL
        val size = category(v)
        emit(acT, (run << 4) | size); emitValue(v, size)
        run = 0
      }
    }
    if (lastNz < 63) emit(acT, 0x00) // EOB
    dc
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Entropy-decode one block into dequantized `coef` (natural
    * order); returns the new DC predictor. */
  private def readBlock(in: BitReader, dcT: HuffTable, acT: HuffTable,
      qt: Array[Int], coef: Array[Int], prevDc: Int): Int = {
    java.util.Arrays.fill(coef, 0)
    val s = dcT.decode(in)
    val dc = prevDc + extend(in.read(s), s)
    coef(0) = dc * qt(0)
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val rs = acT.decode(in)
      val run = rs >> 4
      val size = rs & 0x0f
      if (size == 0) {
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16 // ZRL
        else sys.error(s"bad AC symbol $rs")
      } else {
        k += run
        require(k < 64, "AC coefficient index overflow")
        coef(Zigzag(k)) = extend(in.read(size), size) * qt(Zigzag(k))
        k += 1
      }
    }
    dc
  }

  /** IDCT + level shift + clamp into `plane` (pw wide, tall enough —
    * component planes are padded to whole blocks). */
  private def idctTo(coef: Array[Int], plane: Array[Int], pw: Int,
      px0: Int, py0: Int): Unit = {
    for (y <- 0 until 8; x <- 0 until 8) {
      var sum = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val c = coef(v * 8 + u)
        if (c != 0)
          sum += cScale(u) * cScale(v) * c *
            CosTbl(x * 8 + u) * CosTbl(y * 8 + v)
      }
      plane((py0 + y) * pw + px0 + x) =
        clamp255(math.round(sum / 4 + 128).toInt)
    }
  }

  // ---- segment writers shared by the encoders ----

  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }
  private def seg(out: java.io.ByteArrayOutputStream, m: Int,
      payload: Array[Int]): Unit = {
    marker(out, m)
    val len = payload.length + 2
    out.write(len >>> 8); out.write(len & 0xff)
    payload.foreach(out.write)
  }

  /** The self-defined entropy tables every graft encoder carries:
    * uniform 9-bit DC (categories 0..11) and AC (all legal
    * run/size symbols with size ≤ 10). */
  private def stdTables(): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val dcSyms = (0 to 11).toArray
    val acSyms = (0x00 to 0xff).toArray.filter { s =>
      val size = s & 0x0f
      size <= 10 && (size > 0 || s == 0x00 || s == 0xf0)
    }
    val (dcCounts, dcS) = uniformTable(dcSyms)
    val (acCounts, acS) = uniformTable(acSyms)
    (dcCounts, dcS, acCounts, acS)
  }

  /** Encode an 8-bit grayscale image; width/height need not be
    * multiples of 8 (edge blocks replicate the last row/column, the
    * conventional choice). `qtable` row-major; `restartInterval` > 0
    * emits a DRI segment and RSTn markers every that-many MCUs. */
  def encodeGray(w: Int, h: Int, px: Array[Int],
      qtable: Array[Int] = StdLumaQ, restartInterval: Int = 0): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != $w*$h")
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    seg(out, 0xdb, Array(0x00) ++ Zigzag.map(qtable(_))) // DQT, zigzag order
    seg(out, 0xc0, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff,
      1, 1, 0x11, 0)) // SOF0, 1 component, no subsampling
    val (dcCounts, dcS, acCounts, acS) = stdTables()
    seg(out, 0xc4, Array(0x00) ++ dcCounts ++ dcS)
    seg(out, 0xc4, Array(0x10) ++ acCounts ++ acS)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(restartInterval >>> 8, restartInterval & 0xff))
    seg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcT = new HuffTable(dcCounts, dcS)
    val acT = new HuffTable(acCounts, acS)
    val bw = new BitWriter(out)
    var prevDc = 0
    val coef = new Array[Int](64)
    val blocksY = ceilDiv(h, 8)
    val blocksX = ceilDiv(w, 8)
    var mcu = 0
    var rst = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush(); marker(out, 0xd0 | rst); rst = (rst + 1) & 7
        prevDc = 0
      }
      fdctQuant(px, w, h, bx * 8, by * 8, qtable, coef)
      prevDc = writeBlock(bw, dcT, acT, coef, prevDc)
      mcu += 1
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  // JFIF (CCIR 601) color transform. The grey axis is exact: for
  // R=G=B=v the Y row sums to 1·v and the chroma rows to 0, so
  // Y=v, Cb=Cr=128 after rounding; the inverse at Cb=Cr=128 is the
  // identity.
  private def rgbToY(r: Int, g: Int, b: Int): Int =
    clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
  private def rgbToCb(r: Int, g: Int, b: Int): Int =
    clamp255(math.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt)
  private def rgbToCr(r: Int, g: Int, b: Int): Int =
    clamp255(math.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt)

  /** Encode an 8-bit RGB image (interleaved, length w·h·3) as a
    * 3-component YCbCr baseline JPEG. `subsample` selects 4:2:0
    * (chroma halved both ways, the web default) vs 4:4:4. Chroma
    * downsampling is the 2×2 box mean (exact on constant planes —
    * part of the grey-axis exactness contract). */
  def encodeColor(w: Int, h: Int, rgb: Array[Int],
      subsample: Boolean = true,
      qLuma: Array[Int] = StdLumaQ, qChroma: Array[Int] = StdChromaQ,
      restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"pixel buffer ${rgb.length} != $w*$h*3")
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
      yP(i) = rgbToY(r, g, b)
      cbF(i) = rgbToCb(r, g, b)
      crF(i) = rgbToCr(r, g, b)
      i += 1
    }
    val (hs, vs) = if (subsample) (2, 2) else (1, 1)
    val cw = ceilDiv(w, hs); val ch = ceilDiv(h, vs)
    def down(full: Array[Int]): Array[Int] =
      if (!subsample) full
      else Array.tabulate(cw * ch) { ci =>
        val cx = ci % cw; val cy = ci / cw
        var sum = 0; var n = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val sy = cy * 2 + dy; val sx = cx * 2 + dx
          if (sy < h && sx < w) { sum += full(sy * w + sx); n += 1 }
        }
        math.round(sum.toDouble / n).toInt
      }
    val cbP = down(cbF); val crP = down(crF)

    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    // both quant tables in one DQT segment: id 0 luma, id 1 chroma
    seg(out, 0xdb, Array(0x00) ++ Zigzag.map(qLuma(_)) ++
      Array(0x01) ++ Zigzag.map(qChroma(_)))
    seg(out, 0xc0, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3,
      1, (hs << 4) | vs, 0, // Y: sampling, quant table 0
      2, 0x11, 1, // Cb
      3, 0x11, 1)) // Cr
    // one shared DC and one shared AC table — components may share
    // entropy tables (T.81 allows up to 2 of each in baseline)
    val (dcCounts, dcS, acCounts, acS) = stdTables()
    seg(out, 0xc4, Array(0x00) ++ dcCounts ++ dcS)
    seg(out, 0xc4, Array(0x10) ++ acCounts ++ acS)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(restartInterval >>> 8, restartInterval & 0xff))
    seg(out, 0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcT = new HuffTable(dcCounts, dcS)
    val acT = new HuffTable(acCounts, acS)
    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val prevDc = new Array[Int](3)
    val mcusX = ceilDiv(w, 8 * hs)
    val mcusY = ceilDiv(h, 8 * vs)
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush(); marker(out, 0xd0 | rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(prevDc, 0)
      }
      // Y blocks, left-to-right top-to-bottom within the MCU
      for (bv <- 0 until vs; bh <- 0 until hs) {
        fdctQuant(yP, w, h, (mx * hs + bh) * 8, (my * vs + bv) * 8,
          qLuma, coef)
        prevDc(0) = writeBlock(bw, dcT, acT, coef, prevDc(0))
      }
      fdctQuant(cbP, cw, ch, mx * 8, my * 8, qChroma, coef)
      prevDc(1) = writeBlock(bw, dcT, acT, coef, prevDc(1))
      fdctQuant(crP, cw, ch, mx * 8, my * 8, qChroma, coef)
      prevDc(2) = writeBlock(bw, dcT, acT, coef, prevDc(2))
      mcu += 1
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  private final case class Comp(id: Int, hs: Int, vs: Int, qSel: Int,
      var dcSel: Int = 0, var acSel: Int = 0)

  /** Decode a baseline JPEG → (width, height, channels, pixels
    * 0..255, channel-interleaved row-major). 1-component files
    * decode to the gray plane; 3-component files are YCbCr (per
    * JFIF) and decode to interleaved RGB after box upsampling of
    * subsampled chroma. Tables come from the file's own DQT/DHT
    * segments (general canonical construction); restart intervals
    * are honored (predictor reset + byte realignment at each RSTn,
    * sequence-checked). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (bad SOI)")
    var off = 2
    var w = 0; var h = 0
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var restartInterval = 0
    var sosAt = -1
    while (sosAt < 0) {
      require(off + 4 <= bytes.length, "truncated JPEG headers")
      require((bytes(off) & 0xff) == 0xff, "expected marker")
      val m = bytes(off + 1) & 0xff
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      require(len >= 2 && off + 2 + len <= bytes.length,
        s"bad segment length $len for marker $m")
      val p = off + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var q = p
          while (q < off + 2 + len) {
            val pq = (bytes(q) & 0xff) >> 4
            val tq = bytes(q) & 0x0f
            require(pq == 0, "16-bit quantizers unsupported")
            val t = new Array[Int](64)
            for (k <- 0 until 64)
              t(Zigzag(k)) = bytes(q + 1 + k) & 0xff
            qtables(tq) = t
            q += 65
          }
        case 0xc0 => // SOF0 baseline
          h = ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
          w = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
          require((bytes(p) & 0xff) == 8, "non-8-bit precision")
          val nf = bytes(p + 5) & 0xff
          require(nf == 1 || nf == 3,
            s"unsupported component count $nf (grayscale or YCbCr only)")
          comps = Array.tabulate(nf) { c =>
            val b = p + 6 + 3 * c
            val hv = bytes(b + 1) & 0xff
            val comp = Comp(bytes(b) & 0xff, hv >> 4, hv & 0x0f,
              bytes(b + 2) & 0x0f)
            require(comp.hs >= 1 && comp.hs <= 4 &&
              comp.vs >= 1 && comp.vs <= 4,
              s"bad sampling factors ${comp.hs}x${comp.vs}")
            comp
          }
        case 0xc4 => // DHT (possibly several tables per segment)
          var q = p
          while (q < off + 2 + len) {
            val tc = (bytes(q) & 0xff) >> 4
            val th = bytes(q) & 0x0f
            val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val n = counts.sum
            val syms = Array.tabulate(n)(i => bytes(q + 17 + i) & 0xff)
            val t = new HuffTable(counts, syms)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            q += 17 + n
          }
        case 0xdd => // DRI
          restartInterval =
            ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
        case 0xda => // SOS
          require(comps != null, "SOS before SOF0")
          val ns = bytes(p) & 0xff
          require(ns == comps.length,
            "only single-scan (interleaved) baseline supported")
          for (c <- 0 until ns) {
            val id = bytes(p + 1 + 2 * c) & 0xff
            val comp = comps.find(_.id == id).getOrElse(
              sys.error(s"scan references unknown component $id"))
            comp.dcSel = (bytes(p + 2 + 2 * c) & 0xff) >> 4
            comp.acSel = bytes(p + 2 + 2 * c) & 0x0f
          }
          sosAt = off + 2 + len
        case x if (x >= 0xc1 && x <= 0xc3) || (x >= 0xc5 && x <= 0xc7) ||
            (x >= 0xc9 && x <= 0xcb) || (x >= 0xcd && x <= 0xcf) =>
          sys.error("only baseline (SOF0) JPEG supported")
        case _ => () // APPn/COM/etc skipped
      }
      off += 2 + len
    }
    require(w > 0 && h > 0, "missing SOF0")
    val nf = comps.length
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    // per-component padded planes: whole blocks, whole MCUs
    val mcusX = if (nf == 1) ceilDiv(w, 8) else ceilDiv(w, 8 * hMax)
    val mcusY = if (nf == 1) ceilDiv(h, 8) else ceilDiv(h, 8 * vMax)
    // a single-component scan is non-interleaved: one block per MCU
    // regardless of declared sampling factors (T.81 A.2.2)
    val blocksW = comps.map(c => if (nf == 1) mcusX else mcusX * c.hs)
    val blocksH = comps.map(c => if (nf == 1) mcusY else mcusY * c.vs)
    val planes = Array.tabulate(nf)(c =>
      new Array[Int](blocksW(c) * 8 * blocksH(c) * 8))
    val tables = comps.map { c =>
      val qt = qtables(c.qSel)
      val dcT = dcTables(c.dcSel)
      val acT = acTables(c.acSel)
      require(qt != null && dcT != null && acT != null, "missing tables")
      (qt, dcT, acT)
    }
    val in = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64)
    val prevDc = new Array[Int](nf)
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.expectRestart(rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(prevDc, 0)
      }
      for (c <- 0 until nf) {
        val (qt, dcT, acT) = tables(c)
        val (bhN, bvN) = if (nf == 1) (1, 1) else (comps(c).hs, comps(c).vs)
        for (bv <- 0 until bvN; bh <- 0 until bhN) {
          prevDc(c) = readBlock(in, dcT, acT, qt, coef, prevDc(c))
          idctTo(coef, planes(c), blocksW(c) * 8,
            (mx * bhN + bh) * 8, (my * bvN + bv) * 8)
        }
      }
      mcu += 1
    }
    if (nf == 1) {
      val plane = planes(0)
      val pw = blocksW(0) * 8
      val px = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) px(y * w + x) = plane(y * pw + x)
      (w, h, 1, px)
    } else {
      // box upsampling: output pixel (x, y) samples component c at
      // (x·hs/hMax, y·vs/vMax) — exact on constant planes
      val px = new Array[Int](w * h * 3)
      val pw = Array.tabulate(3)(blocksW(_) * 8)
      for (y <- 0 until h; x <- 0 until w) {
        def sample(c: Int): Int =
          planes(c)((y * comps(c).vs / vMax) * pw(c) + x * comps(c).hs / hMax)
        val yy = sample(0); val cb = sample(1) - 128; val cr = sample(2) - 128
        val o = (y * w + x) * 3
        px(o) = clamp255(math.round(yy + 1.402 * cr).toInt)
        px(o + 1) = clamp255(
          math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
        px(o + 2) = clamp255(math.round(yy + 1.772 * cb).toInt)
      }
      (w, h, 3, px)
    }
  }

  /** Decode a baseline single-component JPEG → (width, height,
    * pixels 0..255 row-major); refuses color files (callers that
    * want either use [[decode]]). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, ch, px) = decode(bytes)
    require(ch == 1, s"expected grayscale JPEG, got $ch channels")
    (w, h, px)
  }
}
