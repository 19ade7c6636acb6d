package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.TarShards
import graft.sources.{Codecs, Gif, Multimodal}

/** WebDataset tar shard export: USTAR round-trip through our own
  * reader, byte-determinism across re-exports, shard assignment, and
  * conformance against the system tar(1) — an independent
  * implementation, like ImageIO for the GIF codec. */
class TarShardsSpec extends SparkSpecBase {
  import spark.implicits._

  private def media(n: Int) = (0L until n.toLong).map { id =>
    if (id % 2 == 0) {
      val px = Array.tabulate(4 * 3 * 3)(j => (j * 7 + id.toInt) % 64)
      Multimodal.MediaRow(id, "image", Gif.encodeGif(4, 3, px),
        Map("src" -> s"crawl${id % 3}", "q\"uote" -> "a\tb"))
    } else {
      Multimodal.MediaRow(id, "audio",
        Codecs.encodeWav(Array.tabulate(16)(i => (id * 31 + i * 5).toInt)),
        Map.empty)
    }
  }

  test("tar shards: round-trip, sample pairing, deterministic re-export") {
    val rows = media(40)
    val ds = rows.toDS().repartition(5)
    val dir = Files.createTempDirectory("tarshards").toString
    val dir2 = Files.createTempDirectory("tarshards2").toString
    try {
      val stats = TarShards.writeTarShards(ds, dir, nShards = 4)
      assert(stats.map(_._2).sum == rows.size)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      assert(files.nonEmpty && files.length <= 4)
      assert(files.forall(_.length % 512 == 0))
      // every sample is a contiguous (<id>.<ext>, <id>.json) pair in
      // ascending id order, with the exact payload bytes
      val byId = rows.map(r => r.id -> r).toMap
      var seen = Set.empty[Long]
      files.foreach { f =>
        val entries = TarShards.readTar(Files.readAllBytes(f.toPath))
        assert(entries.length % 2 == 0)
        val ids = entries.grouped(2).map { pair =>
          val Seq((pname, pbytes), (jname, jbytes)) = pair
          val id = pname.takeWhile(_ != '.').toLong
          assert(jname == s"$id.json", s"pair broken at $pname/$jname")
          assert(pbytes.sameElements(byId(id).bytes), s"payload $id")
          val js = new String(jbytes, "UTF-8")
          assert(js.startsWith("{") && js.contains(s""""id":$id"""))
          if (byId(id).meta.nonEmpty) {
            assert(js.contains(""""q\"uote":"a\tb"""".replace("\\t", "\\\\t"))
              || js.contains("\"q\\\"uote\":\"a\\u0009b\""), js)
          }
          id
        }.toSeq
        assert(ids == ids.sorted, s"${f.getName} not id-sorted")
        seen ++= ids
      }
      assert(seen == rows.map(_.id).toSet)
      // byte-identical re-export (determinism is the resume contract)
      TarShards.writeTarShards(rows.toDS().repartition(3), dir2, 4)
      val files2 = new java.io.File(dir2).listFiles()
        .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      assert(files.map(_.getName).toSeq == files2.map(_.getName).toSeq)
      files.zip(files2).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(Files.readAllBytes(a.toPath),
          Files.readAllBytes(b.toPath)), s"${a.getName} not deterministic")
      }
    } finally Seq(dir, dir2).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("tar shards: distributed reader round-trips export identity") {
    val rows = media(40)
    val dir = Files.createTempDirectory("tarread").toString
    try {
      TarShards.writeTarShards(rows.toDS().repartition(5), dir, 4)
      val got = TarShards.readTarShards(spark, dir)
        .as[(Int, Long, String, Array[Byte], String)].collect()
      assert(got.length == rows.size)
      val byId = rows.map(r => r.id -> r).toMap
      got.foreach { case (shard, id, ext, bytes, meta) =>
        val want = byId(id)
        assert(bytes.sameElements(want.bytes), s"payload $id")
        val wantExt = want.mediaType match {
          case "image" => "gif"
          case "audio" => "wav"
          case other   => other
        }
        assert(ext == wantExt, s"ext $id")
        assert(meta.contains(s""""id":$id"""), s"meta $id")
        want.meta.get("src").foreach(v =>
          assert(meta.contains(s""""src":"$v""""), s"meta src $id"))
        assert(shard >= 0 && shard < 4)
      }
      // shard column matches the writer's deterministic assignment
      val wantShards = rows.toDS()
        .select(col("id"), pmod(xxhash64(col("id")), lit(4)).cast("int"))
        .as[(Long, Int)].collect().toMap
      got.foreach { case (shard, id, _, _, _) =>
        assert(shard == wantShards(id), s"shard of $id")
      }
      // a payload entry whose json partner is missing fails loudly:
      // truncate one shard right after a payload entry
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).head
      val bytes = Files.readAllBytes(f.toPath)
      val entries = TarShards.readTar(bytes)
      val firstLen = 512 + (entries.head._2.length + 511) / 512 * 512
      val broken = java.util.Arrays.copyOf(bytes, firstLen + 1024)
      // zero the tail: end-of-archive right after the payload entry
      java.util.Arrays.fill(broken, firstLen, broken.length, 0.toByte)
      Files.write(f.toPath, broken)
      // the direct rewrite bypassed Hadoop's ChecksumFileSystem —
      // drop the stale .crc sidecar or the read fails on CRC, not
      // on the pairing check under test
      new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
      val ex = intercept[org.apache.spark.SparkException] {
        TarShards.readTarShards(spark, dir).count()
      }
      val msg = ex.getMessage +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("not followed by"), s"got: $msg")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("tar reader: a > 2 GiB entry header fails loudly, never truncates") {
    // hand-built header-only archive: the USTAR octal size field can
    // declare up to 8 GiB, beyond any JVM byte array — the reader must
    // refuse BEFORE allocating (a truncated .toInt would allocate a
    // wrong-sized buffer and desynchronize the 512-byte walk). No
    // payload is materialized: the guard fires on the header alone.
    val hdr = new Array[Byte](512 * 3) // header + 2 end-of-archive blocks
    val name = "7.bin".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(name, 0, hdr, 0, name.length)
    val size = 3L * 1024 * 1024 * 1024 // 3 GiB
    val oct = java.lang.Long.toOctalString(size)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(oct, 0, hdr, 124, oct.length)
    val ex = intercept[IllegalArgumentException](TarShards.readTar(hdr))
    assert(ex.getMessage.contains(s"declares $size bytes"), ex.getMessage)
    // same guard on the distributed reader, with the shard path and
    // entry name in the message
    val dir = Files.createTempDirectory("taroversize").toString
    try {
      Files.write(new java.io.File(dir, "shard-00000.tar").toPath, hdr)
      val ex2 = intercept[org.apache.spark.SparkException] {
        TarShards.readTarShards(spark, dir).count()
      }
      val msg = ex2.getMessage +
        Option(ex2.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(s"declares $size bytes") &&
        msg.contains("7.bin") && msg.contains("shard-00000.tar"),
        s"got: $msg")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("tar shards: the system tar(1) reads our archives (conformance)") {
    import scala.sys.process._
    val haveTar = Process(Seq("bash", "-c", "command -v tar")).! == 0
    if (!haveTar) cancel("no tar binary in this environment")
    val dir = Files.createTempDirectory("tarconf").toString
    try {
      TarShards.writeTarShards(media(12).toDS(), dir, nShards = 1)
      val tarFile = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).head
      val listed = Process(Seq("tar", "-tf", tarFile.toString)).!!
        .split("\n").toSeq.filter(_.nonEmpty)
      assert(listed.length == 24, s"tar -tf saw ${listed.length} entries")
      // extraction parity: tar's bytes == our reader's bytes
      val xdir = Files.createTempDirectory("tarx").toString
      assert(Process(Seq("tar", "-xf", tarFile.toString, "-C", xdir)).! == 0)
      TarShards.readTar(Files.readAllBytes(tarFile.toPath))
        .foreach { case (name, bytes) =>
          val got = Files.readAllBytes(new java.io.File(xdir, name).toPath)
          assert(got.sameElements(bytes), s"tar -xf mismatch for $name")
        }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(xdir))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
