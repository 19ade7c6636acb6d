package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Gif, Multimodal}

/** GIF/LZW codec: bit-exact round-trips across the regimes that
  * exercise every LZW mechanism — code-width growth through all
  * transitions, dictionary reset at 4096, the KwKwK case, interlace,
  * palette limits — plus loud corrupt-input failures. */
class GifSpec extends AnyFunSuite {

  private def rt(w: Int, h: Int, rgb: Array[Int],
      interlaced: Boolean = false): Unit = {
    val bytes = Gif.encodeGif(w, h, rgb, interlaced)
    val (gw, gh, got) = Gif.decodeGif(bytes)
    assert((gw, gh) == (w, h))
    assert(got.sameElements(rgb), s"pixels differ (${w}x$h)")
  }

  private def grey(v: Int) = Array(v, v, v)

  test("round-trip: tiny images, single pixel, single color") {
    rt(1, 1, grey(77))
    rt(3, 2, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
      16, 17, 18))
    // constant image: maximal LZW run-length behavior, KwKwK-heavy
    rt(16, 16, Array.fill(16 * 16 * 3)(123))
  }

  test("round-trip: KwKwK pattern (repeating pair from the first pixel)") {
    // a b a b a b … starting with 'a' forces the code-equal-to-next
    // case early and repeatedly
    val px = Array.tabulate(64 * 3) { j =>
      val i = j / 3
      if (i % 2 == 0) 10 else 200
    }
    rt(8, 8, px)
  }

  test("round-trip: deterministic noise drives width growth to 12 bits") {
    // 256 greys over 128x128 = 16384 pixels with little repetition:
    // the dictionary passes every width transition and hits the 4096
    // reset at least once
    val w = 128; val h = 128
    val px = new Array[Int](w * h * 3)
    var i = 0
    while (i < w * h) {
      val v = ((i.toLong * 2654435761L >>> 8) % 256).toInt
      px(3 * i) = v; px(3 * i + 1) = (v * 7) % 256; px(3 * i + 2) = (v * 13) % 256
      i += 1
    }
    // ≤256 distinct colors: v determines the triple
    rt(w, h, px)
  }

  test("round-trip: interlaced rows come back in order") {
    // row-striped image: any interlace slip moves whole rows
    val w = 8; val h = 17 // odd height exercises all four passes
    val px = Array.tabulate(w * h * 3) { j =>
      val y = (j / 3) / w
      (y * 3) % 256
    }
    rt(w, h, px, interlaced = true)
    rt(w, h, px, interlaced = false)
  }

  test("round-trip: two-color images use the spec minimum code size") {
    val px = Array.tabulate(40 * 3)(j => if ((j / 3) % 5 == 0) 0 else 255)
    rt(8, 5, px)
  }

  test("palette limit: 257 distinct colors refused") {
    val w = 257; val h = 1
    val px = new Array[Int](w * 3)
    (0 until w).foreach { i =>
      px(3 * i) = i % 256; px(3 * i + 1) = i / 256; px(3 * i + 2) = 0
    }
    val e = intercept[IllegalArgumentException] { Gif.encodeGif(w, h, px) }
    assert(e.getMessage.contains("256-color"))
  }

  test("corrupt input fails loudly") {
    val good = Gif.encodeGif(4, 4, Array.tabulate(48)(_ % 17))
    intercept[Exception] { Gif.decodeGif(good.take(10)) }
    intercept[Exception] { Gif.decodeGif("NOTAGIF".getBytes ++ good.drop(7)) }
    // truncated LZW stream (cut before the trailer + terminator)
    intercept[Exception] { Gif.decodeGif(good.dropRight(4)) }
    // 89a header variant accepted
    val g89 = good.clone()
    g89(4) = '9'
    val (w, h, _) = Gif.decodeGif(g89)
    assert((w, h) == (4, 4))
  }

  test("89a extension blocks are skipped") {
    val good = Gif.encodeGif(2, 2, Array.tabulate(12)(_ * 3))
    // splice a Graphic Control Extension right before the image
    // descriptor (0x2c)
    val imgAt = good.indexWhere(_ == 0x2c,
      13 + 3 * 2) // after header + some palette
    val gce = Array(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
      .map(_.toByte)
    val spliced = good.take(imgAt) ++ gce ++ good.drop(imgAt)
    spliced(4) = '9' // claim 89a
    val (w, h, rgb) = Gif.decodeGif(spliced)
    assert((w, h) == (2, 2))
    assert(rgb.sameElements(Array.tabulate(12)(_ * 3)))
  }

  test("round-trip: EOI lands exactly on a width boundary (regression)") {
    // 15-pixel 3-color image whose final dictionary slot the DECODER
    // assigns (after the last data code) is (1 << width) - 1, so EOI
    // is read one bit wider than the pre-fix encoder wrote it; with
    // the w-bit EOI exactly filling the last byte this threw
    // 'truncated LZW stream (no EOI)' on a valid self-encoded GIF.
    val idx = Array(0, 0, 1, 2, 2, 2, 1, 0, 0, 1, 0, 2, 1, 2, 2)
    val colors = Array(Array(10, 20, 30), Array(40, 50, 60),
      Array(70, 80, 90))
    rt(5, 3, idx.flatMap(colors))
  }

  test("round-trip property: randomized images across palette sizes") {
    // seeded (deterministic) fuzz over the regime that found the EOI
    // width bug: small images, small palettes, so the final-slot
    // position relative to width boundaries varies freely
    val rnd = new scala.util.Random(0x6f1d13L)
    for (iter <- 0 until 400) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val nColors = 1 + rnd.nextInt(8)
      val colors = Array.tabulate(nColors)(c =>
        Array(c * 29 % 256, c * 31 % 256, c * 37 % 256))
      val px = Array.fill(w * h)(rnd.nextInt(nColors)).flatMap(colors)
      withClue(s"iter=$iter ${w}x$h colors=$nColors: ") {
        rt(w, h, px, interlaced = iter % 5 == 0)
      }
    }
    // larger palettes / larger images too (width transitions 3→9)
    for (iter <- 0 until 60) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val nColors = 2 + rnd.nextInt(255)
      val colors = Array.tabulate(nColors)(c =>
        Array(c % 256, (c * 7 + 1) % 256, (c * 13 + 5) % 256))
      val px = Array.fill(w * h)(rnd.nextInt(nColors)).flatMap(colors)
      withClue(s"big iter=$iter ${w}x$h colors=$nColors: ") {
        rt(w, h, px)
      }
    }
  }

  test("conformance: the JDK ImageIO GIF reader decodes our streams") {
    // independent-decoder check: the EOI-width regression produced
    // streams OUR tolerant decoder accepts but a strict spec decoder
    // need not; ImageIO is a third-party implementation, so agreement
    // here pins the wire format, not just self-consistency
    val rnd = new scala.util.Random(0xced5caL)
    for (iter <- 0 until 120) {
      val w = 1 + rnd.nextInt(16)
      val h = 1 + rnd.nextInt(16)
      val nColors = 1 + rnd.nextInt(12)
      val colors = Array.tabulate(nColors)(c =>
        Array(c * 19 % 256, c * 23 % 256, c * 41 % 256))
      val px = Array.fill(w * h)(rnd.nextInt(nColors)).flatMap(colors)
      val bytes = Gif.encodeGif(w, h, px)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"iter=$iter: ImageIO returned null")
      assert((img.getWidth, img.getHeight) == (w, h), s"iter=$iter dims")
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val i = y * w + x
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) ==
          ((px(3 * i), px(3 * i + 1), px(3 * i + 2))),
          s"iter=$iter pixel ($x,$y)")
      }
    }
    // and the exact EOI-boundary regression image
    val idx = Array(0, 0, 1, 2, 2, 2, 1, 0, 0, 1, 0, 2, 1, 2, 2)
    val colors = Array(Array(10, 20, 30), Array(40, 50, 60),
      Array(70, 80, 90))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Gif.encodeGif(5, 3, idx.flatMap(colors))))
    assert(img != null && img.getWidth == 5 && img.getHeight == 3)
  }

  test("BinaryDecoder sniffs GIF and sums channels exactly") {
    val px = Array.tabulate(6 * 4 * 3)(j => (j * 5) % 64)
    val bytes = Gif.encodeGif(6, 4, px)
    val (w, h, plane) = Multimodal.BinaryDecoder.decode("image", bytes)
    assert((w, h) == (6, 4))
    (0 until 24).foreach { i =>
      val want = px(3 * i) + px(3 * i + 1) + px(3 * i + 2)
      assert(plane(i) == want.toFloat, s"px $i")
    }
  }
}
