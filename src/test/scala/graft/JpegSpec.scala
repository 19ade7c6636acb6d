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

  test("corrupt input fails loudly, never hangs") {
    val good = Jpeg.encodeGray(8, 8, Array.fill(64)(42))
    intercept[Exception](Jpeg.decodeGray(good.take(20))) // truncated
    intercept[Exception](Jpeg.decodeGray(Array[Byte](1, 2, 3)))
    // flip the SOF0 marker to progressive (SOF2): must refuse
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[Exception](Jpeg.decodeGray(prog))
    assert(e.getMessage.contains("baseline"))
  }
}
