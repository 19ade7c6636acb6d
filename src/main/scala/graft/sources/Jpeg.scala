package graft.sources

/** Baseline sequential GRAYSCALE JPEG (ITU-T T.81), pure JVM, written
  * from the published standard in the repo's from-scratch style —
  * the lossy member of the [[Codecs]] family.
  *
  * Decoder: general for single-component baseline files — canonical
  * Huffman tables are built from the file's own DHT segments (any
  * spec-legal tables, not just ours), DQT dequantization, zigzag
  * (table GENERATED from the diagonal-walk definition, not
  * transcribed), 0xFF00 byte unstuffing, exact float IDCT with
  * round-and-clamp. Encoder: single-component SOF0 with self-defined
  * uniform 9-bit canonical Huffman tables carried in DHT (legal —
  * JPEG files declare their tables; uniform lengths trade a few bytes
  * for a table that cannot be mistranscribed).
  *
  * Exactness contract (what the q127 oracle leans on): an image of
  * FLAT 8×8 blocks with even sample values round-trips EXACTLY —
  * the FDCT of a flat block is DC-only (AC terms cancel exactly,
  * also in float), DC = 8·(v−128) is divisible by the standard
  * luminance quantizer q(0,0)=16 when v is even, and the IDCT of a
  * DC-only block is the flat value back (division by a power of
  * two). Arbitrary images round-trip within a small bounded error
  * (spec'd) — that is JPEG's nature, so the hash-gated oracle uses
  * the exact flat-block subset and ScalaTest covers the lossy AC
  * path with tolerance bounds. */
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

  /** Encode an 8-bit grayscale image; width/height need not be
    * multiples of 8 (edge blocks replicate the last row/column, the
    * conventional choice). `qtable` row-major. */
  def encodeGray(w: Int, h: Int, px: Array[Int],
      qtable: Array[Int] = StdLumaQ): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != $w*$h")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >>> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Zigzag.map(qtable(_))) // DQT, zigzag order
    seg(0xc0, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff,
      1, 1, 0x11, 0)) // SOF0, 1 component, no subsampling
    val dcSyms = (0 to 11).toArray
    val acSyms = (0x00 to 0xff).toArray.filter { s =>
      val size = s & 0x0f
      size <= 10 && (size > 0 || s == 0x00 || s == 0xf0)
    }
    val (dcCounts, dcS) = uniformTable(dcSyms)
    val (acCounts, acS) = uniformTable(acSyms)
    seg(0xc4, Array(0x00) ++ dcCounts ++ dcS)
    seg(0xc4, Array(0x10) ++ acCounts ++ acS)
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcT = new HuffTable(dcCounts, dcS)
    val acT = new HuffTable(acCounts, acS)
    val bw = new BitWriter(out)
    def emit(t: HuffTable, sym: Int): Unit =
      bw.write(t.codeOf(sym), t.lenOf(sym))
    def emitValue(v: Int, s: Int): Unit =
      if (s > 0) bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
    var prevDc = 0
    val coef = new Array[Int](64)
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      // FDCT over the level-shifted block (edge replication)
      for (u <- 0 until 8; v <- 0 until 8) {
        var sum = 0.0
        for (y <- 0 until 8; x <- 0 until 8) {
          val sy = math.min(by * 8 + y, h - 1)
          val sx = math.min(bx * 8 + x, w - 1)
          sum += (px(sy * w + sx) - 128) *
            CosTbl(x * 8 + u) * CosTbl(y * 8 + v)
        }
        val f = 0.25 * cScale(u) * cScale(v) * sum
        coef(v * 8 + u) = math.round(f / qtable(v * 8 + u)).toInt
      }
      val dc = coef(0)
      val diff = dc - prevDc
      prevDc = dc
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
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decode a baseline single-component JPEG → (width, height,
    * pixels 0..255 row-major). Tables come from the file's own
    * DQT/DHT segments (general canonical construction). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (bad SOI)")
    var off = 2
    var w = 0; var h = 0
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var qSel = 0; var dcSel = 0; var acSel = 0
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
          require((bytes(p + 5) & 0xff) == 1,
            "only single-component (grayscale) JPEG supported")
          require((bytes(p + 7) & 0xff) == 0x11, "subsampled grayscale?")
          qSel = bytes(p + 8) & 0x0f
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
        case 0xda => // SOS
          require((bytes(p) & 0xff) == 1, "multi-component scan")
          dcSel = (bytes(p + 2) & 0xff) >> 4
          acSel = bytes(p + 2) & 0x0f
          sosAt = off + 2 + len
        case 0xc1 | 0xc2 | 0xc3 =>
          sys.error("only baseline (SOF0) JPEG supported")
        case _ => () // APPn/COM/etc skipped
      }
      off += 2 + len
    }
    require(w > 0 && h > 0, "missing SOF0")
    val qt = qtables(qSel)
    val dcT = dcTables(dcSel)
    val acT = acTables(acSel)
    require(qt != null && dcT != null && acT != null, "missing tables")
    val in = new BitReader(bytes, sosAt)
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val px = new Array[Int](w * h)
    val coef = new Array[Int](64)
    var prevDc = 0
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      java.util.Arrays.fill(coef, 0)
      val s = dcT.decode(in)
      prevDc += extend(in.read(s), s)
      coef(0) = prevDc * qt(0)
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
      // IDCT + level shift + clamp
      for (y <- 0 until 8; x <- 0 until 8) {
        var sum = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val c = coef(v * 8 + u)
          if (c != 0)
            sum += cScale(u) * cScale(v) * c *
              CosTbl(x * 8 + u) * CosTbl(y * 8 + v)
        }
        val value = math.round(sum / 4 + 128).toInt
        val sy = by * 8 + y
        val sx = bx * 8 + x
        if (sy < h && sx < w)
          px(sy * w + sx) = math.max(0, math.min(255, value))
      }
    }
    (w, h, px)
  }
}
