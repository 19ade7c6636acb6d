package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Jpeg, Multimodal}

/** Baseline grayscale JPEG: the exactness contract (flat even-valued
  * blocks round-trip bit-exactly — what the q127 oracle hashes), the
  * lossy-path error bounds, table/stream robustness, and the
  * BinaryDecoder sniffing. */
class JpegSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(0x77e6_2026L)), p)
    assert(res.passed, res.status.toString)
  }

  test("zigzag table is the standard diagonal walk") {
    // the first and last entries of the normative order
    assert(Jpeg.Zigzag.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Jpeg.Zigzag.toSet == (0 until 64).toSet)
    assert(Jpeg.Zigzag.last == 63)
  }

  test("flat even-valued blocks round-trip EXACTLY (the oracle subset)") {
    check(Prop.forAll(Gen.choose(1, 4), Gen.choose(1, 4),
      Gen.choose(0L, Long.MaxValue)) { (bw, bh, seed) =>
      val w = bw * 8; val h = bh * 8
      val px = Array.tabulate(w * h) { i =>
        val b = (i / w / 8) * bw + (i % w / 8)
        2 * (((seed + b * 2654435761L) % 128).toInt.abs % 128)
      }
      val (dw, dh, got) = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px))
      dw == w && dh == h && got.sameElements(px)
    })
  }

  test("a single flat color is exact at non-multiple-of-8 dims too") {
    for (v <- Seq(0, 2, 128, 254); (w, h) <- Seq((10, 5), (1, 1), (9, 17))) {
      val px = Array.fill(w * h)(v)
      val (dw, dh, got) = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px))
      assert(dw == w && dh == h && got.sameElements(px), s"v=$v ${w}x$h")
    }
  }

  test("arbitrary images round-trip within the DCT rounding bound (unit Q)") {
    check(Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 3),
      Gen.choose(0L, Long.MaxValue)) { (bw, bh, seed) =>
      val w = bw * 8; val h = bh * 8
      val px = Array.tabulate(w * h)(i =>
        ((seed + i.toLong * 40503L) % 256).toInt.abs % 256)
      val (_, _, got) =
        Jpeg.decodeGray(Jpeg.encodeGray(w, h, px, Jpeg.UnitQ))
      // with all-ones quantizers the only loss is coefficient
      // rounding: ≤0.5 per coefficient → a few grey levels per pixel
      px.indices.forall(i => math.abs(got(i) - px(i)) <= 4)
    })
  }

  test("standard-table smooth gradients stay visually faithful") {
    val w = 24; val h = 16
    val px = Array.tabulate(w * h)(i => ((i % w) * 8 + (i / w) * 4) % 256)
    val (_, _, got) = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px))
    val maxErr = px.indices.map(i => math.abs(got(i) - px(i))).max
    assert(maxErr <= 24, s"max error $maxErr") // JPEG-typical bound
  }

  test("BinaryDecoder sniffs the JPEG magic") {
    val px = Array.fill(64)(100)
    val bytes = Jpeg.encodeGray(8, 8, px)
    val (w, h, plane) = Multimodal.BinaryDecoder.decode("video", bytes)
    assert(w == 8 && h == 8 && plane.forall(_ == 100f))
  }

  // ---- color (3-component YCbCr) path ----

  test("flat even grey blocks are exact through the COLOR path, both samplings") {
    check(Prop.forAll(Gen.choose(1, 4), Gen.choose(1, 4),
      Gen.choose(0L, Long.MaxValue), Gen.oneOf(true, false)) {
      (bw, bh, seed, subsample) =>
      val w = bw * 8; val h = bh * 8
      val grey = Array.tabulate(w * h) { i =>
        val b = (i / w / 8) * bw + (i % w / 8)
        2 * (((seed + b * 2654435761L) % 128).toInt.abs % 128)
      }
      val rgb = grey.flatMap(v => Array(v, v, v))
      val bytes = Jpeg.encodeColor(w, h, rgb, subsample)
      val (dw, dh, ch, got) = Jpeg.decode(bytes)
      dw == w && dh == h && ch == 3 && got.sameElements(rgb)
    })
  }

  test("a solid color stays within the chroma DC quantization bound") {
    for ((r, g, b) <- Seq((200, 30, 60), (10, 250, 128), (90, 90, 200));
         subsample <- Seq(true, false)) {
      val w = 16; val h = 16
      val rgb = Array.tabulate(w * h * 3)(i => Seq(r, g, b)(i % 3))
      val (_, _, ch, got) = Jpeg.decode(Jpeg.encodeColor(w, h, rgb, subsample))
      assert(ch == 3)
      // chroma DC steps 17 → ≤ ~9 chroma error → ≤ ~16 after the
      // inverse transform's 1.772 gain; luma step 16 adds ≤ 8
      val maxErr = rgb.indices.map(i => math.abs(got(i) - rgb(i))).max
      assert(maxErr <= 24, s"solid ($r,$g,$b) subsample=$subsample err $maxErr")
    }
  }

  test("arbitrary RGB at 4:4:4 unit quantizers: conversion+DCT rounding only") {
    check(Prop.forAll(Gen.choose(1, 2), Gen.choose(1, 2),
      Gen.choose(0L, Long.MaxValue)) { (bw, bh, seed) =>
      val w = bw * 8; val h = bh * 8
      val rgb = Array.tabulate(w * h * 3)(i =>
        ((seed + i.toLong * 48271L) % 256).toInt.abs % 256)
      val (_, _, _, got) = Jpeg.decode(Jpeg.encodeColor(w, h, rgb,
        subsample = false, qLuma = Jpeg.UnitQ, qChroma = Jpeg.UnitQ))
      // YCbCr round-trip rounding (≤ ~2/channel via the ~1.8 inverse
      // gain) + per-coefficient DCT rounding (≤ 4, as in the gray
      // bound test)
      rgb.indices.forall(i => math.abs(got(i) - rgb(i)) <= 8)
    })
  }

  test("4:2:0 smooth gradients stay visually faithful") {
    val w = 32; val h = 32
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      Seq((x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256)(i % 3)
    }
    val (_, _, _, got) = Jpeg.decode(Jpeg.encodeColor(w, h, rgb))
    val maxErr = rgb.indices.map(i => math.abs(got(i) - rgb(i))).max
    assert(maxErr <= 48, s"max error $maxErr") // subsampled-chroma bound
  }

  test("restart intervals: DRI streams decode identically (gray and color)") {
    val w = 24; val h = 24
    val grey = Array.tabulate(w * h)(i => (i * 37) % 256)
    val plain = Jpeg.decodeGray(Jpeg.encodeGray(w, h, grey))._3
    for (ri <- Seq(1, 2, 5)) {
      val bytes = Jpeg.encodeGray(w, h, grey, restartInterval = ri)
      assert(Jpeg.decodeGray(bytes)._3.sameElements(plain), s"gray ri=$ri")
    }
    val rgb = grey.flatMap(v => Array(v, (v + 85) % 256, (v + 170) % 256))
    for (subsample <- Seq(true, false); ri <- Seq(1, 3)) {
      val plainC = Jpeg.decode(Jpeg.encodeColor(w, h, rgb, subsample))._4
      val bytes = Jpeg.encodeColor(w, h, rgb, subsample, restartInterval = ri)
      assert(Jpeg.decode(bytes)._4.sameElements(plainC),
        s"color subsample=$subsample ri=$ri")
    }
    // more restarts than the 8 RSTn values: the modulo-8 cycle must
    // wrap correctly (24x24 at ri=1 is 9 MCUs at 4:4:4)
    val many = Jpeg.encodeColor(w, h, rgb, subsample = false,
      restartInterval = 1)
    assert(Jpeg.decode(many)._4.sameElements(
      Jpeg.decode(Jpeg.encodeColor(w, h, rgb, subsample = false))._4))
  }

  test("an out-of-sequence restart marker fails loudly") {
    val grey = Array.tabulate(576)(i => (i * 37) % 256)
    val bytes = Jpeg.encodeGray(24, 24, grey, restartInterval = 2)
    // find the first RST0 (FFD0) in the entropy stream and bump it
    val i = bytes.indices.dropWhile(j => !(j > 0 &&
      (bytes(j - 1) & 0xff) == 0xff && (bytes(j) & 0xff) == 0xd0)).head
    val bad = bytes.clone(); bad(i) = 0xd3.toByte
    val e = intercept[Exception](Jpeg.decodeGray(bad))
    assert(e.getMessage.contains("restart"))
  }

  test("color decodeGray refuses; CMYK refuses; truncated color fails") {
    val rgb = Array.fill(8 * 8 * 3)(128)
    val color = Jpeg.encodeColor(8, 8, rgb, subsample = false)
    val e = intercept[Exception](Jpeg.decodeGray(color))
    assert(e.getMessage.contains("3 channels"))
    intercept[Exception](Jpeg.decode(color.take(color.length / 2)))
    // rewrite the SOF0 component count to 4 (CMYK-shaped): refuse
    val sofAt = color.indices.find(i =>
      (color(i) & 0xff) == 0xff && (color(i + 1) & 0xff) == 0xc0).get
    val cmyk = color.clone(); cmyk(sofAt + 9) = 4.toByte
    val e2 = intercept[Exception](Jpeg.decode(cmyk))
    assert(e2.getMessage.contains("component count"))
  }

  test("BinaryDecoder collapses color JPEG to the channel-sum plane") {
    val rgb = Array.tabulate(16 * 16 * 3) { i =>
      val grey = 2 * (((i / 3) / 16 / 8 * 2 + ((i / 3) % 16) / 8) * 40 % 128)
      grey
    }
    val bytes = Jpeg.encodeColor(16, 16, rgb)
    val (w, h, plane) = Multimodal.BinaryDecoder.decode("image", bytes)
    assert(w == 16 && h == 16)
    // flat even grey blocks → exact → plane = 3×grey everywhere
    val expect = (0 until 256).map(p => 3f * rgb(p * 3))
    assert(plane.toSeq == expect)
  }

  test("corrupt input fails loudly, never hangs") {
    val good = Jpeg.encodeGray(8, 8, Array.fill(64)(42))
    intercept[Exception](Jpeg.decodeGray(good.take(20))) // truncated
    intercept[Exception](Jpeg.decodeGray(Array[Byte](1, 2, 3)))
    // flip SOF0 to SOF2: the baseline full-band scan header is
    // malformed as a progressive scan (Ss=0 with Se=63) — loud
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[Exception](Jpeg.decodeGray(prog))
    assert(e.getMessage.contains("cannot mix DC and AC"))
    // SOF1 (extended sequential) stays refused
    val sof1 = good.clone(); sof1(sofAt + 1) = 0xc1.toByte
    val e2 = intercept[Exception](Jpeg.decodeGray(sof1))
    assert(e2.getMessage.contains("SOF0"))
  }

  // ---- progressive (SOF2) path ----

  test("progressive gray decodes bit-identically to baseline") {
    // same quantized coefficients through six scans (DC first/refine,
    // AC first/refine over two bands) must reconstruct the same image
    check(Prop.forAll(Gen.choose(1, 4), Gen.choose(1, 4),
      Gen.choose(0L, Long.MaxValue), Gen.oneOf(true, false)) {
      (bw, bh, seed, unitQ) =>
      val w = bw * 8 + (seed % 5).toInt.abs // non-multiple-of-8 dims too
      val h = bh * 8 + (seed % 3).toInt.abs
      val px = Array.tabulate(w * h)(i =>
        ((seed + i.toLong * 40503L) % 256).toInt.abs % 256)
      val q = if (unitQ) Jpeg.UnitQ else Jpeg.StdLumaQ
      val base = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px, q))
      val prog = Jpeg.decodeGray(Jpeg.encodeGrayProgressive(w, h, px, q))
      prog._1 == w && prog._2 == h && prog._3.sameElements(base._3)
    })
  }

  test("progressive color decodes bit-identically to baseline, both samplings") {
    check(Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 3),
      Gen.choose(0L, Long.MaxValue), Gen.oneOf(true, false)) {
      (bw, bh, seed, subsample) =>
      val w = bw * 8 + (seed % 7).toInt.abs
      val h = bh * 8 + (seed % 4).toInt.abs
      val rgb = Array.tabulate(w * h * 3)(i =>
        ((seed + i.toLong * 48271L) % 256).toInt.abs % 256)
      val base = Jpeg.decode(Jpeg.encodeColor(w, h, rgb, subsample))
      val prog = Jpeg.decode(Jpeg.encodeColorProgressive(w, h, rgb, subsample))
      prog._1 == w && prog._2 == h && prog._3 == 3 &&
        prog._4.sameElements(base._4)
    })
  }

  test("flat even grey blocks are exact through progressive (the q131 subset)") {
    check(Prop.forAll(Gen.choose(1, 4), Gen.choose(1, 3),
      Gen.choose(0L, Long.MaxValue), Gen.oneOf(true, false)) {
      (bw, bh, seed, color) =>
      val w = bw * 8; val h = bh * 8
      val grey = Array.tabulate(w * h) { i =>
        val b = (i / w / 8) * bw + (i % w / 8)
        2 * (((seed + b * 2654435761L) % 128).toInt.abs % 128)
      }
      if (color) {
        val rgb = grey.flatMap(v => Array(v, v, v))
        val bytes = Jpeg.encodeColorProgressive(w, h, rgb,
          subsample = seed % 2 == 0)
        val (dw, dh, ch, got) = Jpeg.decode(bytes)
        dw == w && dh == h && ch == 3 && got.sameElements(rgb)
      } else {
        val (dw, dh, got) =
          Jpeg.decodeGray(Jpeg.encodeGrayProgressive(w, h, grey))
        dw == w && dh == h && got.sameElements(grey)
      }
    })
  }

  test("progressive restart intervals decode identically (every scan kind)") {
    val w = 24; val h = 24
    val grey = Array.tabulate(w * h)(i => (i * 37) % 256)
    val plain = Jpeg.decodeGray(Jpeg.encodeGrayProgressive(w, h, grey))._3
    for (ri <- Seq(1, 2, 5)) {
      val bytes = Jpeg.encodeGrayProgressive(w, h, grey, restartInterval = ri)
      assert(Jpeg.decodeGray(bytes)._3.sameElements(plain), s"gray ri=$ri")
    }
    val rgb = grey.flatMap(v => Array(v, (v + 85) % 256, (v + 170) % 256))
    for (subsample <- Seq(true, false); ri <- Seq(1, 3)) {
      val plainC =
        Jpeg.decode(Jpeg.encodeColorProgressive(w, h, rgb, subsample))._4
      val bytes = Jpeg.encodeColorProgressive(w, h, rgb, subsample,
        restartInterval = ri)
      assert(Jpeg.decode(bytes)._4.sameElements(plainC),
        s"color subsample=$subsample ri=$ri")
    }
  }

  test("progressive corrupt input fails loudly") {
    val px = Array.tabulate(256)(i => (i * 53) % 256)
    val bytes = Jpeg.encodeGrayProgressive(16, 16, px)
    intercept[Exception](Jpeg.decode(bytes.take(bytes.length / 2)))
    // no EOI: the scan loop must not run off the end
    intercept[Exception](Jpeg.decode(bytes.dropRight(2)))
    // color progressive via decodeGray refuses
    val rgb = Array.fill(8 * 8 * 3)(128)
    val color = Jpeg.encodeColorProgressive(8, 8, rgb)
    val e = intercept[Exception](Jpeg.decodeGray(color))
    assert(e.getMessage.contains("3 channels"))
  }

  test("BinaryDecoder handles progressive JPEG transparently") {
    val grey = Array.tabulate(16 * 16) { i =>
      2 * (((i / 16 / 8) * 2 + (i % 16) / 8) * 40 % 128)
    }
    val rgb = grey.flatMap(v => Array(v, v, v))
    val bytes = Jpeg.encodeColorProgressive(16, 16, rgb)
    val (w, h, plane) = Multimodal.BinaryDecoder.decode("image", bytes)
    assert(w == 16 && h == 16)
    assert(plane.toSeq == grey.map(3f * _).toSeq)
  }
}
