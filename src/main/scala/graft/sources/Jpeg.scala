package graft.sources

/** Baseline sequential (SOF0) AND progressive (SOF2) JPEG
  * (ITU-T T.81), pure JVM, written from the published standard in
  * the repo's from-scratch style — the lossy member of the
  * [[Codecs]] family. Grayscale AND color (YCbCr, 4:4:4 / 4:2:0 or
  * any spec-legal sampling factors).
  *
  * Decoder: general — canonical Huffman tables are built from the
  * file's own DHT segments (any spec-legal tables, not just ours),
  * DQT dequantization, zigzag (table GENERATED from the
  * diagonal-walk definition, not transcribed), 0xFF00 byte
  * unstuffing, restart intervals (DRI + RSTn with DC-predictor reset
  * and byte realignment), interleaved multi-component MCUs with
  * per-component sampling factors, box chroma upsampling, JFIF
  * YCbCr→RGB, exact float IDCT with round-and-clamp. Progressive
  * streams decode through the full T.81 Annex G machinery: any
  * sequence of spectral-selection / successive-approximation scans
  * (DC first + refinement, AC first with EOBn end-of-band runs, AC
  * refinement with correction bits), quantized coefficients
  * accumulated across scans and reconstructed once. Encoder:
  * single-component or 3-component SOF0 with self-defined uniform
  * 9-bit canonical Huffman tables carried in DHT (legal — JPEG files
  * declare their tables; uniform lengths trade a few bytes for a
  * table that cannot be mistranscribed), optional restart intervals;
  * plus a progressive (SOF2) encoder emitting a six-scan script that
  * exercises every scan kind (the fixture generator for the decoder
  * and the q131 oracle — JpegSpec proves its output decodes
  * bit-identically to the baseline encoding of the same image).
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

  /** Entropy-decode one baseline block into the QUANTIZED zigzag
    * coefficient store at `base` (dequantization happens once at
    * reconstruction, shared with the progressive path); returns the
    * new DC predictor. */
  private def readBlockZ(in: BitReader, dcT: HuffTable, acT: HuffTable,
      cz: Array[Int], base: Int, prevDc: Int): Int = {
    val s = dcT.decode(in)
    val dc = prevDc + extend(in.read(s), s)
    cz(base) = dc
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
        cz(base + k) = extend(in.read(size), size)
        k += 1
      }
    }
    dc
  }

  // ---- progressive (SOF2) scan kernels, T.81 Annex G ----

  /** AC first scan (Ah=0) for one block's band [ss, se]: run/size
    * coding like baseline, plus EOBn symbols (size 0, run < 15)
    * declaring a run of 2^run + appended-bits blocks — including
    * this one — with no further coefficients in the band. Decoded
    * values carry the point transform (<< al). Returns the
    * remaining end-of-band run. */
  private def readAcFirst(in: BitReader, acT: HuffTable, cz: Array[Int],
      base: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    if (eobrun0 > 0) return eobrun0 - 1
    var k = ss
    while (k <= se) {
      val rs = acT.decode(in)
      val r = rs >> 4
      val s = rs & 0x0f
      if (s == 0) {
        if (r < 15)
          return (1 << r) - 1 + (if (r > 0) in.read(r) else 0)
        k += 16 // ZRL
      } else {
        k += r
        require(k <= se, "AC coefficient index past band")
        cz(base + k) = extend(in.read(s), s) << al
        k += 1
      }
    }
    0
  }

  /** AC refinement scan (Ah = Al+1) for one block's band: newly
    * nonzero coefficients arrive as ±(1 << al) after a run of
    * ZERO-HISTORY positions, and every already-nonzero coefficient
    * traversed contributes one appended correction bit (1 = grow
    * the magnitude by 1 << al). EOBn covers whole blocks, whose
    * nonzero coefficients still receive correction bits. The
    * two's-complement `& p1` guard works because magnitudes below
    * this scan's bit position are still zero (see the bit-Al
    * identity in the Scaladoc of [[decode]]). Returns the remaining
    * end-of-band run. */
  private def readAcRefine(in: BitReader, acT: HuffTable, cz: Array[Int],
      base: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    val p1 = 1 << al
    def correct(k: Int): Unit =
      if (in.read(1) == 1 && (cz(base + k) & p1) == 0)
        cz(base + k) += (if (cz(base + k) >= 0) p1 else -p1)
    var k = ss
    var eobrun = eobrun0
    if (eobrun == 0) {
      var brk = false
      while (k <= se && !brk) {
        val rs = acT.decode(in)
        var r = rs >> 4
        val s = rs & 0x0f
        var newval = 0
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) + (if (r > 0) in.read(r) else 0)
            brk = true
          } // r == 15: ZRL — pass 16 zero-history coefficients
        } else {
          require(s == 1, s"bad AC refinement symbol $rs")
          newval = if (in.read(1) == 1) p1 else -p1
        }
        if (!brk) {
          var placed = false
          while (!placed && k <= se) {
            if (cz(base + k) != 0) correct(k)
            else if (r == 0) {
              if (newval != 0) cz(base + k) = newval
              placed = true
            } else r -= 1
            k += 1
          }
          require(placed || newval == 0,
            "refinement newly-nonzero coefficient past band end")
        }
      }
    }
    if (eobrun > 0) {
      while (k <= se) { if (cz(base + k) != 0) correct(k); k += 1 }
      eobrun - 1
    } else 0
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
    * run/size symbols with size ≤ 10). In progressive AC scans the
    * size-0 symbols 0x10..0xE0 are EOBn run-length codes (T.81
    * G.1.2.2), so the progressive table includes them; baseline
    * keeps only EOB (0x00) and ZRL (0xF0). */
  private def stdTables(progressive: Boolean = false)
      : (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val dcSyms = (0 to 11).toArray
    val acSyms = (0x00 to 0xff).toArray.filter { s =>
      val size = s & 0x0f
      size <= 10 && (size > 0 || progressive || s == 0x00 || s == 0xf0)
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

  /** RGB → (Y, Cb, Cr) planes with optional 2×2 box-mean chroma
    * downsampling (exact on constant planes — part of the grey-axis
    * exactness contract). Returns (yP, cbP, crP, cw, ch). */
  private def ycbcrPlanes(w: Int, h: Int, rgb: Array[Int],
      subsample: Boolean): (Array[Int], Array[Int], Array[Int], Int, Int) = {
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
    (yP, down(cbF), down(crF), cw, ch)
  }

  /** Encode an 8-bit RGB image (interleaved, length w·h·3) as a
    * 3-component YCbCr baseline JPEG. `subsample` selects 4:2:0
    * (chroma halved both ways, the web default) vs 4:4:4. */
  def encodeColor(w: Int, h: Int, rgb: Array[Int],
      subsample: Boolean = true,
      qLuma: Array[Int] = StdLumaQ, qChroma: Array[Int] = StdChromaQ,
      restartInterval: Int = 0): Array[Byte] = {
    val (yP, cbP, crP, cw, ch) = ycbcrPlanes(w, h, rgb, subsample)
    val (hs, vs) = if (subsample) (2, 2) else (1, 1)

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

  // ---- progressive (SOF2) encoder ----

  /** AC first-scan encoder for one spectral band: baseline
    * run/size coding plus deferred EOBn runs merged across blocks
    * (flushed before any in-block symbol, at restarts, at scan end,
    * and at the 32767-block cap — the largest run EOB14 can carry). */
  private final class AcFirstEncoder(bw: BitWriter, acT: HuffTable,
      ss: Int, se: Int, al: Int) {
    private var eobrun = 0
    private def emitSym(sym: Int): Unit =
      bw.write(acT.codeOf(sym), acT.lenOf(sym))
    def flush(): Unit = if (eobrun > 0) {
      var r = 0
      while ((2 << r) <= eobrun) r += 1 // floor(log2(eobrun))
      emitSym(r << 4)
      if (r > 0) bw.write(eobrun - (1 << r), r)
      eobrun = 0
    }
    def block(cz: Array[Int], base: Int): Unit = {
      // sign-magnitude point transform (T.81 G.1.2.2)
      def sval(k: Int) = {
        val v = cz(base + k)
        if (v >= 0) v >> al else -((-v) >> al)
      }
      var lastNz = ss - 1
      var k = ss
      while (k <= se) { if (sval(k) != 0) lastNz = k; k += 1 }
      if (lastNz < ss) {
        eobrun += 1
        if (eobrun == 0x7fff) flush()
        return
      }
      flush()
      var run = 0
      k = ss
      while (k <= lastNz) {
        val v = sval(k)
        if (v == 0) run += 1
        else {
          while (run > 15) { emitSym(0xf0); run -= 16 }
          val s = category(v)
          emitSym((run << 4) | s)
          bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
          run = 0
        }
        k += 1
      }
      if (lastNz < se) {
        eobrun += 1
        if (eobrun == 0x7fff) flush()
      }
    }
  }

  /** AC refinement-scan encoder (Ah = Al+1): newly nonzero
    * coefficients are coded as runs of ZERO-HISTORY positions with a
    * sign bit, every already-nonzero coefficient traversed appends
    * one correction bit (in traversal order, after the symbol), and
    * block tails with no new coefficients fold into deferred EOBn
    * runs whose buffered correction bits follow the EOBn symbol —
    * the exact mirror of [[readAcRefine]]. */
  private final class AcRefineEncoder(bw: BitWriter, acT: HuffTable,
      ss: Int, se: Int, al: Int) {
    private var eobrun = 0
    private val pendingEob = scala.collection.mutable.ArrayBuffer[Int]()
    private def emitSym(sym: Int): Unit =
      bw.write(acT.codeOf(sym), acT.lenOf(sym))
    def flush(): Unit = if (eobrun > 0) {
      var r = 0
      while ((2 << r) <= eobrun) r += 1
      emitSym(r << 4)
      if (r > 0) bw.write(eobrun - (1 << r), r)
      pendingEob.foreach(bw.write(_, 1))
      pendingEob.clear()
      eobrun = 0
    }
    def block(cz: Array[Int], base: Int): Unit = {
      def mag(k: Int) = math.abs(cz(base + k)) >> al
      def prevNz(k: Int) = (math.abs(cz(base + k)) >> (al + 1)) != 0
      var eob = ss - 1 // position of the last NEWLY nonzero coefficient
      var k = ss
      while (k <= se) { if (!prevNz(k) && mag(k) != 0) eob = k; k += 1 }
      if (eob < ss) { // whole band joins the EOB run
        eobrun += 1
        k = ss
        while (k <= se) { if (prevNz(k)) pendingEob += (mag(k) & 1); k += 1 }
        if (eobrun == 0x7fff) flush()
        return
      }
      flush()
      // events since the last symbol: -1 = zero-history position,
      // else a correction bit for an already-nonzero coefficient
      val events = scala.collection.mutable.ArrayBuffer[Int]()
      var zeros = 0
      k = ss
      while (k <= eob) {
        if (prevNz(k)) events += (mag(k) & 1)
        else if (mag(k) == 0) { events += -1; zeros += 1 }
        else {
          require(mag(k) == 1, "refinement scan must add exactly one bit")
          var idx = 0
          while (zeros > 15) { // split long runs with ZRL
            emitSym(0xf0)
            var consumed = 0
            while (consumed < 16) {
              if (events(idx) < 0) consumed += 1
              else bw.write(events(idx), 1)
              idx += 1
            }
            zeros -= 16
          }
          emitSym((zeros << 4) | 1)
          bw.write(if (cz(base + k) > 0) 1 else 0, 1) // sign of ±1<<al
          while (idx < events.length) {
            if (events(idx) >= 0) bw.write(events(idx), 1)
            idx += 1
          }
          events.clear()
          zeros = 0
        }
        k += 1
      }
      if (eob < se) { // tail corrections ride the next EOBn
        eobrun += 1
        k = eob + 1
        while (k <= se) { if (prevNz(k)) pendingEob += (mag(k) & 1); k += 1 }
        if (eobrun == 0x7fff) flush()
      }
    }
  }

  /** Emit a complete progressive (SOF2) stream for prepared
    * component planes: a spectral-selection × successive-
    * approximation script that exercises all four scan kinds — DC
    * first (Al=1, interleaved), AC first per component over two
    * bands (1..5, 6..63) at Al=1, DC refinement, then the matching
    * AC refinement scans. Geometry mirrors [[decode]]: interleaved
    * scans cover the MCU-padded grid, non-interleaved AC scans only
    * each component's own ceil(dim/8) blocks. */
  private def writeProgressive(out: java.io.ByteArrayOutputStream,
      w: Int, h: Int, planes: Array[Array[Int]],
      pws: Array[Int], phs: Array[Int],
      hsArr: Array[Int], vsArr: Array[Int],
      qsel: Array[Int], qts: Array[Array[Int]],
      restartInterval: Int): Unit = {
    val nf = planes.length
    val hMax = hsArr.max; val vMax = vsArr.max
    val mcusX = if (nf == 1) ceilDiv(w, 8) else ceilDiv(w, 8 * hMax)
    val mcusY = if (nf == 1) ceilDiv(h, 8) else ceilDiv(h, 8 * vMax)
    val blocksW = Array.tabulate(nf)(c =>
      if (nf == 1) mcusX else mcusX * hsArr(c))
    val blocksH = Array.tabulate(nf)(c =>
      if (nf == 1) mcusY else mcusY * vsArr(c))
    val scanBW = Array.tabulate(nf)(c =>
      ceilDiv(ceilDiv(w * hsArr(c), hMax), 8))
    val scanBH = Array.tabulate(nf)(c =>
      ceilDiv(ceilDiv(h * vsArr(c), vMax), 8))
    // quantize every block up front (zigzag order per block)
    val coefs = Array.tabulate(nf) { c =>
      val cz = new Array[Int](blocksW(c) * blocksH(c) * 64)
      val nat = new Array[Int](64)
      for (by <- 0 until blocksH(c); bx <- 0 until blocksW(c)) {
        fdctQuant(planes(c), pws(c), phs(c), bx * 8, by * 8,
          qts(qsel(c)), nat)
        val base = (by * blocksW(c) + bx) * 64
        var k = 0
        while (k < 64) { cz(base + k) = nat(Zigzag(k)); k += 1 }
      }
      cz
    }
    marker(out, 0xd8) // SOI
    seg(out, 0xdb, qts.indices.toArray.flatMap(t =>
      Array(t) ++ Zigzag.map(qts(t)(_))))
    seg(out, 0xc2, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff, nf) ++
      (0 until nf).flatMap(c =>
        Seq(c + 1, (hsArr(c) << 4) | vsArr(c), qsel(c))))
    val (dcCounts, dcS, acCounts, acS) = stdTables(progressive = true)
    seg(out, 0xc4, Array(0x00) ++ dcCounts ++ dcS)
    seg(out, 0xc4, Array(0x10) ++ acCounts ++ acS)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(restartInterval >>> 8, restartInterval & 0xff))
    val dcT = new HuffTable(dcCounts, dcS)
    val acT = new HuffTable(acCounts, acS)

    def sosSeg(cs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(out, 0xda, Array(cs.length) ++
        cs.flatMap(c => Seq(c + 1, 0x00)) ++
        Array(ss, se, (ah << 4) | al))

    // DC scans: interleaved over the full MCU-padded grid
    def dcScan(refine: Boolean, al: Int): Unit = {
      sosSeg(0 until nf, 0, 0, if (refine) al + 1 else 0, al)
      val bw = new BitWriter(out)
      val prevDc = new Array[Int](nf)
      var mcu = 0; var rst = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); marker(out, 0xd0 | rst); rst = (rst + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
      def blockDc(c: Int, by: Int, bx: Int): Unit = {
        val dc = coefs(c)((by * blocksW(c) + bx) * 64)
        if (refine) bw.write((dc >> al) & 1, 1)
        else { // arithmetic-shift point transform (T.81 G.1.2.1)
          val v = dc >> al
          val diff = v - prevDc(c)
          prevDc(c) = v
          val s = category(diff)
          bw.write(dcT.codeOf(s), dcT.lenOf(s))
          if (s > 0) bw.write(if (diff >= 0) diff
            else diff + (1 << s) - 1, s)
        }
      }
      if (nf == 1)
        for (by <- 0 until blocksH(0); bx <- 0 until blocksW(0)) {
          maybeRestart(); blockDc(0, by, bx); mcu += 1
        }
      else
        for (my <- 0 until mcusY; mx <- 0 until mcusX) {
          maybeRestart()
          for (c <- 0 until nf; bv <- 0 until vsArr(c);
               bh <- 0 until hsArr(c))
            blockDc(c, my * vsArr(c) + bv, mx * hsArr(c) + bh)
          mcu += 1
        }
      bw.flush()
    }

    // AC scans: non-interleaved, one component, one band
    def acScan(c: Int, ss: Int, se: Int, refine: Boolean, al: Int): Unit = {
      sosSeg(Seq(c), ss, se, if (refine) al + 1 else 0, al)
      val bw = new BitWriter(out)
      val first = if (refine) null else new AcFirstEncoder(bw, acT, ss, se, al)
      val ref = if (refine) new AcRefineEncoder(bw, acT, ss, se, al) else null
      var mcu = 0; var rst = 0
      for (by <- 0 until scanBH(c); bx <- 0 until scanBW(c)) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (refine) ref.flush() else first.flush()
          bw.flush(); marker(out, 0xd0 | rst); rst = (rst + 1) & 7
        }
        val base = (by * blocksW(c) + bx) * 64
        if (refine) ref.block(coefs(c), base)
        else first.block(coefs(c), base)
        mcu += 1
      }
      if (refine) ref.flush() else first.flush()
      bw.flush()
    }

    dcScan(refine = false, al = 1)
    for (c <- 0 until nf) acScan(c, 1, 5, refine = false, al = 1)
    for (c <- 0 until nf) acScan(c, 6, 63, refine = false, al = 1)
    dcScan(refine = true, al = 0)
    for (c <- 0 until nf) acScan(c, 1, 5, refine = true, al = 0)
    for (c <- 0 until nf) acScan(c, 6, 63, refine = true, al = 0)
    marker(out, 0xd9) // EOI
  }

  /** Progressive (SOF2) grayscale encoding — same quantized
    * coefficients as [[encodeGray]], delivered across six scans, so
    * decodes bit-identically to the baseline encoding of the same
    * image (JpegSpec asserts this), and flat even-grey blocks keep
    * the exact round trip (q131). */
  def encodeGrayProgressive(w: Int, h: Int, px: Array[Int],
      qtable: Array[Int] = StdLumaQ,
      restartInterval: Int = 0): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != $w*$h")
    val out = new java.io.ByteArrayOutputStream()
    writeProgressive(out, w, h, Array(px), Array(w), Array(h),
      Array(1), Array(1), Array(0), Array(qtable), restartInterval)
    out.toByteArray
  }

  /** Progressive (SOF2) YCbCr color encoding — same quantized
    * coefficients as [[encodeColor]] (shared plane prep and
    * [[fdctQuant]]), so it decodes bit-identically to the baseline
    * encoding and preserves the grey-axis exactness contract. */
  def encodeColorProgressive(w: Int, h: Int, rgb: Array[Int],
      subsample: Boolean = true,
      qLuma: Array[Int] = StdLumaQ, qChroma: Array[Int] = StdChromaQ,
      restartInterval: Int = 0): Array[Byte] = {
    val (yP, cbP, crP, cw, ch) = ycbcrPlanes(w, h, rgb, subsample)
    val (hs, vs) = if (subsample) (2, 2) else (1, 1)
    val out = new java.io.ByteArrayOutputStream()
    writeProgressive(out, w, h, Array(yP, cbP, crP),
      Array(w, cw, cw), Array(h, ch, ch),
      Array(hs, 1, 1), Array(vs, 1, 1),
      Array(0, 1, 1), Array(qLuma, qChroma), restartInterval)
    out.toByteArray
  }

  private final case class Comp(id: Int, hs: Int, vs: Int, qSel: Int,
      var dcSel: Int = 0, var acSel: Int = 0)

  /** Skip any writer-stuffed (0xFF, 0x00) pairs the bit consumer
    * never touched, returning the offset of the next real marker. */
  private def alignToMarker(bytes: Array[Byte], off0: Int): Int = {
    var o = off0
    while (o + 1 < bytes.length && (bytes(o) & 0xff) == 0xff &&
        (bytes(o + 1) & 0xff) == 0x00) o += 2
    o
  }

  /** The single interleaved baseline scan: every component's blocks
    * in MCU order into the quantized-coefficient stores. */
  private def decodeBaselineScan(in: BitReader, comps: Array[Comp],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      coefs: Array[Array[Int]], blocksW: Array[Int],
      mcusX: Int, mcusY: Int, restartInterval: Int): Unit = {
    val nf = comps.length
    val tables = comps.map { c =>
      val dcT = dcTables(c.dcSel)
      val acT = acTables(c.acSel)
      require(dcT != null && acT != null, "missing entropy tables")
      (dcT, acT)
    }
    val prevDc = new Array[Int](nf)
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.expectRestart(rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(prevDc, 0)
      }
      for (c <- 0 until nf) {
        val (dcT, acT) = tables(c)
        val (bhN, bvN) = if (nf == 1) (1, 1) else (comps(c).hs, comps(c).vs)
        for (bv <- 0 until bvN; bh <- 0 until bhN) {
          val base =
            ((my * bvN + bv) * blocksW(c) + (mx * bhN + bh)) * 64
          prevDc(c) = readBlockZ(in, dcT, acT, coefs(c), base, prevDc(c))
        }
      }
      mcu += 1
    }
  }

  /** One progressive scan's entropy data into the stores. DC scans
    * (Ss=0) may interleave several components; AC scans are
    * single-component and cover only the component's own
    * ceil(dim/8) block grid — never the MCU-padding blocks (T.81
    * A.2.2, G.1). Restart markers reset predictors AND the
    * end-of-band run. */
  private def decodeProgressiveScan(in: BitReader, scanComps: Array[Int],
      comps: Array[Comp], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], coefs: Array[Array[Int]],
      blocksW: Array[Int], scanBW: Array[Int], scanBH: Array[Int],
      mcusX: Int, mcusY: Int, ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Unit = {
    require(ss >= 0 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    if (ss == 0)
      require(se == 0, "progressive scans cannot mix DC and AC")
    else
      require(scanComps.length == 1, "AC scans must be non-interleaved")
    require(ah == 0 || ah == al + 1, s"bad successive approximation $ah/$al")
    val prevDc = new Array[Int](comps.length)
    var eobrun = 0
    var mcu = 0
    var rst = 0
    def restartIfDue(): Unit =
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.expectRestart(rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(prevDc, 0)
        eobrun = 0
      }
    def doBlock(c: Int, by: Int, bx: Int): Unit = {
      val base = (by * blocksW(c) + bx) * 64
      val cz = coefs(c)
      if (ss == 0) {
        if (ah == 0) { // DC first: arithmetic-shift point transform
          val dcT = dcTables(comps(c).dcSel)
          require(dcT != null, "missing DC table")
          val s = dcT.decode(in)
          prevDc(c) += extend(in.read(s), s)
          cz(base) = prevDc(c) << al
        } else { // DC refinement: one raw bit, no table
          if (in.read(1) == 1) cz(base) |= (1 << al)
        }
      } else {
        val acT = acTables(comps(c).acSel)
        require(acT != null, "missing AC table")
        eobrun =
          if (ah == 0) readAcFirst(in, acT, cz, base, ss, se, al, eobrun)
          else readAcRefine(in, acT, cz, base, ss, se, al, eobrun)
      }
    }
    if (scanComps.length == 1) { // non-interleaved: MCU = one block
      val c = scanComps(0)
      for (by <- 0 until scanBH(c); bx <- 0 until scanBW(c)) {
        restartIfDue()
        doBlock(c, by, bx)
        mcu += 1
      }
    } else {
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        restartIfDue()
        for (ci <- scanComps; bv <- 0 until comps(ci).vs;
             bh <- 0 until comps(ci).hs)
          doBlock(ci, my * comps(ci).vs + bv, mx * comps(ci).hs + bh)
        mcu += 1
      }
    }
  }

  /** Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    * (width, height, channels, pixels 0..255, channel-interleaved
    * row-major). 1-component files decode to the gray plane;
    * 3-component files are YCbCr (per JFIF) and decode to
    * interleaved RGB after box upsampling of subsampled chroma.
    * Tables come from the file's own DQT/DHT segments (general
    * canonical construction); restart intervals are honored in every
    * scan (predictor + EOB-run reset, byte realignment, sequence
    * checks).
    *
    * Both paths accumulate QUANTIZED coefficients (zigzag order) per
    * block and reconstruct once at the end — baseline in its single
    * interleaved scan, progressive across any sequence of T.81
    * Annex G scans: DC first (arithmetic-shift point transform), DC
    * refinement (one appended bit at Al — the two's-complement `|=`
    * is exact because DC successive approximation is defined on the
    * arithmetic-shift representation), AC first per band with EOBn
    * runs, and AC refinement (sign-magnitude point transform). The
    * refinement guard `coef & (1 << Al)` is sound on negatives: for
    * n a multiple of 2^Al, bit Al of -n equals bit Al of n (write
    * n = m·2^Al; then -n = (2^(32-Al) - m)·2^Al, whose bit Al is
    * bit 0 of -m = bit 0 of m). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (bad SOI)")
    var off = 2
    var w = 0; var h = 0
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var progressive = false
    var restartInterval = 0
    var nScans = 0
    // geometry + quantized-coefficient stores, allocated at SOF
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    var scanBW: Array[Int] = null // non-interleaved-scan block dims
    var scanBH: Array[Int] = null
    var coefs: Array[Array[Int]] = null
    var eoi = false
    while (!eoi) {
      require(off + 2 <= bytes.length, "truncated JPEG (no EOI)")
      require((bytes(off) & 0xff) == 0xff, "expected marker")
      var m = bytes(off + 1) & 0xff
      while (m == 0xff) { // 0xFF fill bytes before a marker are legal
        off += 1
        require(off + 2 <= bytes.length, "truncated JPEG (fill bytes)")
        m = bytes(off + 1) & 0xff
      }
      if (m == 0xd9) { eoi = true } // EOI (no length field)
      else {
        require(off + 4 <= bytes.length, "truncated JPEG headers")
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        require(len >= 2 && off + 2 + len <= bytes.length,
          s"bad segment length $len for marker $m")
        val p = off + 4
        var nextOff = off + 2 + len
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
          case 0xc0 | 0xc2 => // SOF0 baseline | SOF2 progressive
            require(comps == null, "multiple SOF segments")
            progressive = m == 0xc2
            h = ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
            w = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
            require((bytes(p) & 0xff) == 8, "non-8-bit precision")
            require(w > 0 && h > 0, "empty frame")
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
            val hMax = comps.map(_.hs).max
            val vMax = comps.map(_.vs).max
            // per-component padded grids: whole blocks, whole MCUs.
            // A single-component FRAME is always non-interleaved:
            // one block per MCU regardless of declared sampling
            // factors (T.81 A.2.2).
            mcusX = if (nf == 1) ceilDiv(w, 8) else ceilDiv(w, 8 * hMax)
            mcusY = if (nf == 1) ceilDiv(h, 8) else ceilDiv(h, 8 * vMax)
            blocksW = comps.map(c => if (nf == 1) mcusX else mcusX * c.hs)
            blocksH = comps.map(c => if (nf == 1) mcusY else mcusY * c.vs)
            // non-interleaved scans cover only ceil(compDim/8) blocks
            // (T.81 A.2.2) — the MCU-padding blocks beyond stay zero
            scanBW = comps.map(c => ceilDiv(ceilDiv(w * c.hs, hMax), 8))
            scanBH = comps.map(c => ceilDiv(ceilDiv(h * c.vs, vMax), 8))
            coefs = Array.tabulate(nf)(c =>
              new Array[Int](blocksW(c) * blocksH(c) * 64))
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
            require(comps != null, "SOS before SOF")
            val ns = bytes(p) & 0xff
            val scanComps = Array.tabulate(ns) { c =>
              val id = bytes(p + 1 + 2 * c) & 0xff
              val ci = comps.indexWhere(_.id == id)
              require(ci >= 0, s"scan references unknown component $id")
              comps(ci).dcSel = (bytes(p + 2 + 2 * c) & 0xff) >> 4
              comps(ci).acSel = bytes(p + 2 + 2 * c) & 0x0f
              ci
            }
            val ss = bytes(p + 1 + 2 * ns) & 0xff
            val se = bytes(p + 2 + 2 * ns) & 0xff
            val ahal = bytes(p + 3 + 2 * ns) & 0xff
            val in = new BitReader(bytes, off + 2 + len)
            if (!progressive) {
              require(ns == comps.length,
                "only single-scan (interleaved) baseline supported")
              decodeBaselineScan(in, comps, dcTables, acTables, coefs,
                blocksW, mcusX, mcusY, restartInterval)
            } else
              decodeProgressiveScan(in, scanComps, comps, dcTables,
                acTables, coefs, blocksW, scanBW, scanBH, mcusX, mcusY,
                ss, se, ahal >> 4, ahal & 0x0f, restartInterval)
            nScans += 1
            nextOff = alignToMarker(bytes, in.off)
          case x if (x >= 0xc1 && x <= 0xc3 && x != 0xc2) ||
              (x >= 0xc5 && x <= 0xc7) ||
              (x >= 0xc9 && x <= 0xcb) || (x >= 0xcd && x <= 0xcf) =>
            sys.error("only baseline (SOF0) or progressive (SOF2) " +
              "JPEG supported")
          case _ => () // APPn/COM/etc skipped
        }
        off = nextOff
      }
    }
    require(comps != null && w > 0 && h > 0, "missing SOF")
    require(nScans > 0, "no scan before EOI")
    val nf = comps.length
    // dequantize + IDCT every block of the padded grids
    val planes = Array.tabulate(nf)(c =>
      new Array[Int](blocksW(c) * 8 * blocksH(c) * 8))
    val nat = new Array[Int](64)
    for (c <- 0 until nf) {
      val qt = qtables(comps(c).qSel)
      require(qt != null, "missing quantization table")
      val pw = blocksW(c) * 8
      for (by <- 0 until blocksH(c); bx <- 0 until blocksW(c)) {
        val base = (by * blocksW(c) + bx) * 64
        var k = 0
        while (k < 64) {
          nat(Zigzag(k)) = coefs(c)(base + k) * qt(Zigzag(k))
          k += 1
        }
        idctTo(nat, planes(c), pw, bx * 8, by * 8)
      }
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
      val hMax = comps.map(_.hs).max
      val vMax = comps.map(_.vs).max
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
