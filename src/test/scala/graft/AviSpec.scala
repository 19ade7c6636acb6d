package graft

import graft.sources.{Avi, Jpeg, Multimodal}

/** AVI/MJPEG container: byte-exact frame round-trip, header parity,
  * the BinaryDecoder film-strip path, and loud corrupt-input
  * failures (same discipline as CodecsSpec/JpegSpec). */
class AviSpec extends SparkSpecBase {

  private def flatJpeg(w: Int, h: Int, grey: Int): Array[Byte] =
    Jpeg.encodeGray(w, h, Array.fill(w * h)(grey))

  test("container round-trip: frames come back byte-exact, header intact") {
    val frames = (0 until 7).map(f => flatJpeg(16, 8, 2 * (f * 9 % 128)))
    val avi = Avi.encodeMjpeg(16, 8, frames, fps = 30)
    val (w, h, fps, got) = Avi.decodeMjpeg(avi)
    assert((w, h, fps) == (16, 8, 30))
    assert(got.length == 7)
    got.zip(frames).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("odd-length frames respect RIFF word alignment") {
    // JPEG payload lengths vary; force an odd one with a 1-byte tail
    val f0 = flatJpeg(8, 8, 100)
    val odd =
      if (f0.length % 2 == 1) f0 else f0 :+ 0xd9.toByte // still parses
    val frames = Seq(odd, flatJpeg(8, 8, 50), odd)
    val (_, _, _, got) = Avi.decodeMjpeg(Avi.encodeMjpeg(8, 8, frames))
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("BinaryDecoder stacks AVI frames as an exact film strip") {
    val greys = Seq(10, 240, 6)
    val frames = greys.map(g => flatJpeg(8, 8, g))
    val avi = Avi.encodeMjpeg(8, 8, frames)
    val (w, h, px) = Multimodal.BinaryDecoder.decode("video", avi)
    assert((w, h) == (8, 24)) // 3 frames of 8x8 stacked
    // flat even-grey blocks round-trip exactly through baseline JPEG
    greys.zipWithIndex.foreach { case (g, i) =>
      (0 until 64).foreach { j =>
        assert(px(i * 64 + j) == g.toFloat, s"frame $i px $j")
      }
    }
  }

  test("corrupt input fails loudly: magic, codec, counts, truncation") {
    val good = Avi.encodeMjpeg(8, 8, Seq(flatJpeg(8, 8, 20), flatJpeg(8, 8, 22)))
    // not RIFF / not AVI
    intercept[Exception] { Avi.decodeMjpeg("nope".getBytes ++ good.drop(4)) }
    val wav = graft.sources.Codecs.encodeWav(Array.fill(16)(0))
    intercept[Exception] { Avi.decodeMjpeg(wav) }
    // truncated movi list (40 bytes is exactly idx1 — cut deeper so
    // the movi LIST's declared length overruns the file)
    intercept[Exception] { Avi.decodeMjpeg(good.dropRight(60)) }
    // frame-count mismatch: header says 2, movi holds 1 — rebuild a
    // file whose avih dwTotalFrames is bumped
    val tampered = good.clone()
    // avih payload starts at RIFF(12) + LIST hdr(12) + 'avih'+len(8)
    val totalOff = 12 + 12 + 8 + 16
    tampered(totalOff) = (tampered(totalOff) + 1).toByte
    intercept[Exception] { Avi.decodeMjpeg(tampered) }
    // non-MJPG vids stream refused
    val vidsAt = {
      val s = new String(good.map(_.toChar))
      s.indexOf("vids")
    }
    val wrongCodec = good.clone()
    wrongCodec(vidsAt + 4) = 'H'; wrongCodec(vidsAt + 5) = '2'
    wrongCodec(vidsAt + 6) = '6'; wrongCodec(vidsAt + 7) = '4'
    intercept[Exception] { Avi.decodeMjpeg(wrongCodec) }
  }

  test("sampleFrames keeps every nth frame and skips non-video rows") {
    import spark.implicits._
    val frames = (0 until 6).map(f => flatJpeg(8, 8, 2 * f))
    val avi = Avi.encodeMjpeg(8, 8, frames)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi, Map.empty),
      Multimodal.MediaRow(2L, "image", flatJpeg(8, 8, 4), Map.empty))
    val got = Multimodal.sampleFrames(rows.toDS(), 3).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      Seq((1L, 0), (1L, 3)))
  }
}
