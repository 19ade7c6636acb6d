package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Codecs, Multimodal}

/** The pure-JVM media codecs: generative round-trips (every PNG
  * filter branch, BMP row padding, odd WAV lengths), hand-built
  * robustness cases (ancillary chunks, split IDAT, top-down BMP), and
  * the [[Multimodal.BinaryDecoder]] sniffing contract. */
class CodecsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(80)
        .withInitialSeed(org.scalacheck.rng.Seed(0x11c0_dec5_2026L)), p)
    assert(res.passed, res.status.toString)
  }

  private val dimGen = Gen.choose(1, 21)

  test("PNG: encode → decode is the identity (grey, RGB, RGBA)") {
    check(Prop.forAll(dimGen, dimGen, Gen.oneOf(1, 3, 4),
      Gen.choose(0L, Long.MaxValue)) { (w, h, ch, seed) =>
      // h up to 21 ⇒ the cycling encoder exercises all 5 filters
      val px = Array.tabulate(w * h * ch)(i =>
        ((seed + i.toLong * 2654435761L) % 256).toInt)
      val (dw, dh, dch, dpx) = Codecs.decodePng(Codecs.encodePng(w, h, ch, px))
      dw == w && dh == h && dch == ch && dpx.sameElements(px)
    })
  }

  test("PNG: 16-bit depth and Adam7 interlace round-trip exactly") {
    check(Prop.forAll(dimGen, dimGen, Gen.oneOf(1, 3, 4),
      Gen.oneOf(8, 16), Gen.oneOf(false, true),
      Gen.choose(0L, Long.MaxValue)) { (w, h, ch, depth, il, seed) =>
      val maxV = if (depth == 16) 65536L else 256L
      val px = Array.tabulate(w * h * ch)(i =>
        ((seed + i.toLong * 2654435761L) % maxV).toInt)
      val (dw, dh, dch, dpx) = Codecs.decodePng(
        Codecs.encodePng(w, h, ch, px, bitDepth = depth, interlaced = il))
      dw == w && dh == h && dch == ch && dpx.sameElements(px)
    })
  }

  test("PNG: Adam7 pass geometry covers edge dimensions") {
    // every w,h in 1..9 — the range where Adam7 passes go empty or
    // degenerate (1×1 uses only pass 1; 2×2 passes 1+6+7; …)
    for (w <- 1 to 9; h <- 1 to 9) {
      val px = Array.tabulate(w * h)(i => (i * 37 + w * 5 + h) % 256)
      val (dw, dh, _, dpx) = Codecs.decodePng(
        Codecs.encodePng(w, h, 1, px, interlaced = true))
      assert(dw == w && dh == h && dpx.sameElements(px), s"${w}x$h")
    }
  }

  test("WAV: stereo round-trips frame-interleaved; decoder sums frames") {
    val stereo = Array.tabulate(14)(i =>
      if (i % 2 == 0) i * 100 else -i * 50) // L/R interleaved, 7 frames
    val bytes = Codecs.encodeWav(stereo, 22050, channels = 2)
    val (rate, ch, got) = Codecs.decodeWav(bytes)
    assert(rate == 22050 && ch == 2 && got.sameElements(stereo))
    val (frames, one, plane) = Multimodal.BinaryDecoder.decode("x", bytes)
    assert(frames == 7 && one == 1)
    (0 until 7).foreach(f =>
      assert(plane(f) == (stereo(2 * f) + stereo(2 * f + 1)).toFloat))
  }

  test("BMP: encode → decode is the identity across padding widths") {
    check(Prop.forAll(dimGen, dimGen, Gen.choose(0L, Long.MaxValue)) {
      (w, h, seed) =>
        val rgb = Array.tabulate(w * h * 3)(i =>
          ((seed + i.toLong * 40503L) % 256).toInt)
        val (dw, dh, dpx) = Codecs.decodeBmp(Codecs.encodeBmp(w, h, rgb))
        dw == w && dh == h && dpx.sameElements(rgb)
    })
  }

  test("WAV: encode → decode is the identity, odd lengths included") {
    check(Prop.forAll(Gen.choose(1, 99), Gen.choose(0L, Long.MaxValue)) {
      (n, seed) =>
        val samples = Array.tabulate(n)(i =>
          ((seed + i.toLong * 7919L) % 65536).toInt - 32768)
        val (rate, ch, got) =
          Codecs.decodeWav(Codecs.encodeWav(samples, 8000))
        rate == 8000 && ch == 1 && got.sameElements(samples)
    })
  }

  test("PNG decoder skips ancillary chunks and joins split IDAT") {
    val px = Array.tabulate(6 * 7)(i => (i * 11) % 256)
    val encoded = Codecs.encodePng(6, 7, 1, px)
    // locate the single IDAT chunk and split it into two, inserting a
    // tEXt chunk in front — both are spec-legal layouts
    def be32(b: Array[Byte], o: Int) =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var off = 8
    var idatOff = -1; var idatLen = -1
    while (idatOff < 0) {
      val len = be32(encoded, off)
      val typ = new String(encoded, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idatOff = off; idatLen = len }
      else off += 8 + len + 4
    }
    val data = encoded.slice(idatOff + 8, idatOff + 8 + idatLen)
    val (d1, d2) = data.splitAt(data.length / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(encoded, 0, idatOff)
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      val l = payload.length
      out.write(Array((l >>> 24).toByte, (l >>> 16).toByte,
        (l >>> 8).toByte, l.toByte))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(payload)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    chunk("tEXt", "comment\u0000synthetic".getBytes("US-ASCII"))
    chunk("IDAT", d1)
    chunk("IDAT", d2)
    out.write(encoded, idatOff + 8 + idatLen + 4,
      encoded.length - (idatOff + 8 + idatLen + 4))
    val (w, h, ch, got) = Codecs.decodePng(out.toByteArray)
    assert((w, h, ch) == (6, 7, 1) && got.sameElements(px))
  }

  test("BMP decoder handles top-down rows (negative height)") {
    val w = 3; val h = 2
    val rgb = Array.tabulate(w * h * 3)(i => (i * 17) % 256)
    val bottomUp = Codecs.encodeBmp(w, h, rgb)
    // flip to top-down: negate the height field and reverse row order
    val topDown = bottomUp.clone()
    val neg = -h
    topDown(22) = neg.toByte; topDown(23) = (neg >> 8).toByte
    topDown(24) = (neg >> 16).toByte; topDown(25) = (neg >> 24).toByte
    val padded = w * 3 + (4 - (w * 3) % 4) % 4
    for (y <- 0 until h; b <- 0 until padded)
      topDown(54 + y * padded + b) = bottomUp(54 + (h - 1 - y) * padded + b)
    val (dw, dh, got) = Codecs.decodeBmp(topDown)
    assert((dw, dh) == (w, h) && got.sameElements(rgb))
  }

  test("WAV decoder walks past extra RIFF chunks") {
    val samples = Array.tabulate(9)(i => i * 1000 - 4000)
    val base = Codecs.encodeWav(samples, 44100)
    // splice a LIST chunk between fmt and data
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36) // RIFF..fmt chunk end
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](4, 0, 0, 0))
    out.write("INFO".getBytes("US-ASCII"))
    out.write(base, 36, base.length - 36)
    val (rate, ch, got) = Codecs.decodeWav(out.toByteArray)
    assert(rate == 44100 && ch == 1 && got.sameElements(samples))
  }

  test("BinaryDecoder sniffs magic bytes, not the type hint") {
    val png = Codecs.encodePng(4, 4, 3,
      Array.tabulate(48)(i => (i * 5) % 256))
    val bmp = Codecs.encodeBmp(2, 2, Array.tabulate(12)(i => i * 20))
    val wav = Codecs.encodeWav(Array(100, -100, 0), 16000)
    // deliberately wrong hints — the bytes are authoritative
    val (pw, ph, ppx) = Multimodal.BinaryDecoder.decode("audio", png)
    assert((pw, ph) == (4, 4) &&
      ppx(0) == (0 + 5 + 10).toFloat) // RGB collapses to channel sum
    val (bw, bh, bpx) = Multimodal.BinaryDecoder.decode("video", bmp)
    assert((bw, bh) == (2, 2) && bpx(0) == (0 + 20 + 40).toFloat)
    val (ww, wh, wpx) = Multimodal.BinaryDecoder.decode("image", wav)
    assert((ww, wh) == (3, 1) && wpx.toSeq == Seq(100f, -100f, 0f))
    val err = intercept[RuntimeException](
      Multimodal.BinaryDecoder.decode("image", Array[Byte](1, 2, 3)))
    assert(err.getMessage.contains("unrecognized media payload"))
  }
}
