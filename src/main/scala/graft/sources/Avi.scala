package graft.sources

import java.nio.charset.StandardCharsets

/** AVI (RIFF) container with MJPEG video — the video leg of the
  * multimodal pipeline, pure JVM, written from the public Microsoft
  * RIFF/AVI 1.0 specification (the `avih`/`strh`/`strf` header
  * layout, the `movi` chunk list, the `idx1` index). MJPEG is the
  * one video codec this repo can carry end to end with REAL bytes:
  * every frame is a standalone baseline/progressive JPEG decoded by
  * [[Jpeg]], so frame sampling — the operation a training-data
  * pipeline actually runs over video — goes container parse →
  * select every-nth → real JPEG decode, all oracle-checkable
  * (q136's flat-block frames round-trip exactly).
  *
  * Same corrupt-input discipline as [[Codecs]]: a malformed length,
  * a truncated list, or a frame-count mismatch throws a descriptive
  * error; nothing wedges or silently truncates.
  */
object Avi {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.US_ASCII)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, StandardCharsets.US_ASCII)

  /** Encode JPEG frames into a RIFF AVI with one MJPEG video stream.
    * `frames` are complete JPEG byte payloads (one `00dc` chunk
    * each); `w`/`h` must match what the frames decode to — the
    * header is authoritative for players, so [[decodeMjpeg]]
    * re-checks it per frame. Writes the standard `idx1` keyframe
    * index (every MJPEG frame is a keyframe). */
  def encodeMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]],
      fps: Int = 25): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(fps > 0, s"bad fps $fps")
    require(frames.nonEmpty, "no frames")
    val maxFrame = frames.map(_.length).max

    def list(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(12 + body.length)
      out.write(fourcc("LIST")); out.write(le32(4 + body.length))
      out.write(fourcc(typ)); out.write(body)
      out.toByteArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + body.length + 1)
      out.write(fourcc(id)); out.write(le32(body.length)); out.write(body)
      if ((body.length & 1) == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }

    // avih — MainAVIHeader (56 bytes)
    val avih = {
      val o = new java.io.ByteArrayOutputStream(56)
      o.write(le32(1000000 / fps)) // dwMicroSecPerFrame
      o.write(le32(maxFrame * fps)) // dwMaxBytesPerSec
      o.write(le32(0)) // dwPaddingGranularity
      o.write(le32(0x10)) // dwFlags: AVIF_HASINDEX
      o.write(le32(frames.length)) // dwTotalFrames
      o.write(le32(0)) // dwInitialFrames
      o.write(le32(1)) // dwStreams
      o.write(le32(maxFrame)) // dwSuggestedBufferSize
      o.write(le32(w)); o.write(le32(h))
      (0 until 4).foreach(_ => o.write(le32(0))) // dwReserved
      o.toByteArray
    }
    // strh — AVIStreamHeader (56 bytes)
    val strh = {
      val o = new java.io.ByteArrayOutputStream(56)
      o.write(fourcc("vids")); o.write(fourcc("MJPG"))
      o.write(le32(0)) // dwFlags
      o.write(le16(0)); o.write(le16(0)) // wPriority, wLanguage
      o.write(le32(0)) // dwInitialFrames
      o.write(le32(1)); o.write(le32(fps)) // dwScale, dwRate
      o.write(le32(0)) // dwStart
      o.write(le32(frames.length)) // dwLength (in frames)
      o.write(le32(maxFrame)) // dwSuggestedBufferSize
      o.write(le32(-1)) // dwQuality (default)
      o.write(le32(0)) // dwSampleSize (varies per frame)
      o.write(le16(0)); o.write(le16(0)) // rcFrame
      o.write(le16(w)); o.write(le16(h))
      o.toByteArray
    }
    // strf — BITMAPINFOHEADER (40 bytes)
    val strf = {
      val o = new java.io.ByteArrayOutputStream(40)
      o.write(le32(40)) // biSize
      o.write(le32(w)); o.write(le32(h))
      o.write(le16(1)); o.write(le16(24)) // biPlanes, biBitCount
      o.write(fourcc("MJPG")) // biCompression
      o.write(le32(w * h * 3)) // biSizeImage (uncompressed bound)
      o.write(le32(0)); o.write(le32(0)) // pels/meter
      o.write(le32(0)); o.write(le32(0)) // clrUsed, clrImportant
      o.toByteArray
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)

    val moviBody = new java.io.ByteArrayOutputStream()
    // idx1 offsets are relative to the 'movi' fourcc position, the
    // convention the reference players expect
    val offsets = frames.map { f =>
      val off = 4 + moviBody.size() // 4 = the 'movi' type fourcc
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val o = new java.io.ByteArrayOutputStream(16 * frames.length)
      frames.zip(offsets).foreach { case (f, off) =>
        o.write(fourcc("00dc"))
        o.write(le32(0x10)) // AVIIF_KEYFRAME
        o.write(le32(off))
        o.write(le32(f.length))
      }
      chunk("idx1", o.toByteArray)
    }

    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream(8 + riffBody.length)
    out.write(fourcc("RIFF")); out.write(le32(riffBody.length))
    out.write(riffBody)
    out.toByteArray
  }

  /** Parse a RIFF AVI with an MJPEG video stream →
    * (width, height, fps, frames as raw JPEG payloads). Walks the
    * chunk lists with the [[Codecs.decodeWav]] discipline (corrupt
    * lengths throw, word alignment respected, unknown chunks
    * skipped); the header frame count must match the `movi` chunks
    * actually present. Frames are NOT decoded here — sampling wants
    * to select before paying the JPEG decode. */
  def decodeMjpeg(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "AVI ", "not an AVI (bad RIFF/'AVI ' magic)")
    var w = -1; var h = -1; var fps = -1; var total = -1
    var handlerSeen = false
    val frames = Array.newBuilder[Array[Byte]]

    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = tag(bytes, off)
        val len = readLe32(bytes, off + 4)
        require(len >= 0, s"negative RIFF chunk length $len for '$id'")
        require(off + 8 + len.toLong <= end, s"truncated RIFF chunk '$id'")
        id match {
          case "LIST" =>
            require(len >= 4, s"LIST chunk too short ($len bytes)")
            val typ = tag(bytes, off + 8)
            walk(off + 12, off + 8 + len, inMovi = typ == "movi")
          case "avih" =>
            require(len >= 56, s"avih too short ($len bytes)")
            val micros = readLe32(bytes, off + 8)
            require(micros > 0, s"bad frame duration $micros")
            fps = 1000000 / micros
            total = readLe32(bytes, off + 8 + 16)
            w = readLe32(bytes, off + 8 + 32)
            h = readLe32(bytes, off + 8 + 36)
            require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          case "strh" =>
            require(len >= 8, s"strh too short ($len bytes)")
            val fccType = tag(bytes, off + 8)
            val handler = tag(bytes, off + 12)
            if (fccType == "vids") {
              require(handler == "MJPG",
                s"unsupported video codec '$handler' (want MJPG)")
              handlerSeen = true
            }
          case "00dc" | "00db" if inMovi =>
            val f = new Array[Byte](len)
            System.arraycopy(bytes, off + 8, f, 0, len)
            frames += f
          case _ => ()
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, bytes.length, inMovi = false)

    require(w > 0, "missing avih header")
    require(handlerSeen, "no MJPG video stream (missing strh)")
    val fs = frames.result()
    require(total < 0 || total == fs.length,
      s"header frame count $total != ${fs.length} movi chunks")
    require(fs.nonEmpty, "no video frames in movi list")
    (w, h, fps, fs)
  }
}
