package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.sources.Multimodal.MediaRow

/** WebDataset-style tar shard export — the artifact multimodal
  * training loaders actually stream (one `.tar` per shard, each
  * sample a pair of entries `<key>.<ext>` payload + `<key>.json`
  * metadata, samples contiguous so a loader never seeks backwards).
  * The tar writer is pure JVM, written from the PUBLIC POSIX USTAR
  * layout (512-byte headers: octal size/mtime fields, space-seeded
  * checksum, `ustar` magic) — no archiver dependency, and the spec
  * proves conformance against the system `tar(1)` like the GIF
  * codec proves against ImageIO.
  *
  * Determinism: a sample's shard is `pmod(xxhash64(id), nShards)`
  * (stable across runs and cluster sizes), samples are sorted by id
  * within a shard, and headers pin mtime/uid/gid/mode — so the SAME
  * corpus always produces byte-identical shards (resumable pipelines
  * can hash-compare exports).
  *
  * Scale: one shuffle (repartition by shard) then a single pass per
  * partition streaming entries straight to the shard file — bytes
  * are never buffered beyond one sample. Tasks write to a temp file
  * and rename into place, so a retried/speculated attempt replaces
  * rather than corrupts (content is deterministic, the rename is the
  * commit). */
object TarShards {

  /** One 512-byte USTAR header. `name` ≤ 100 bytes (keys here are
    * numeric ids — far below). */
  private def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(UTF_8)
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      // NUL-terminated zero-padded octal, the USTAR numeric form
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, name)
    oct(100, 8, 420) // mode 0644
    oct(108, 8, 0) // uid
    oct(116, 8, 0) // gid
    oct(124, 12, size)
    oct(136, 12, 0) // mtime: epoch — deterministic exports
    put(156, "0") // typeflag: regular file
    put(257, "ustar")
    h(263) = '0'; h(264) = '0' // version "00" (magic is NUL-ended)
    put(265, "root"); put(297, "root")
    oct(329, 8, 0); oct(337, 8, 0) // devmajor/minor
    // checksum: sum of all header bytes with the checksum field
    // itself read as spaces, written as 6 octal digits + NUL + space
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum))
    h(154) = 0; h(155) = ' '
    h
  }

  private def writeEntry(out: java.io.OutputStream, name: String,
      bytes: Array[Byte]): Unit = {
    out.write(header(name, bytes.length.toLong))
    out.write(bytes)
    val pad = (512 - bytes.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < 0x20 => "\\u%04x".format(c.toInt)
      case c             => c.toString
    }

  private def extOf(mediaType: String): String = mediaType match {
    case "image" | "gif"          => "gif"
    case "jpeg" | "jpeg_color"    => "jpg"
    case "audio"                  => "wav"
    case "video"                  => "avi"
    case other                    => if (other.isEmpty) "bin" else other
  }

  /** Export `media` as `nShards` WebDataset tar shards under `dir`
    * (`shard-00000.tar`…). Returns (shard, samples, bytes) per
    * non-empty shard.
    *
    * All I/O goes through the Hadoop FileSystem API (the session's
    * hadoopConfiguration is shipped to executors as plain entries),
    * so `dir` can be HDFS/local alike — a 1000-executor export writes
    * its shards straight to the cluster store, no local-disk detour.
    * The tmp→rename commit is atomic on HDFS and local filesystems;
    * on object stores it degrades to copy+delete (same caveat as
    * [[graft.operators.BandIndexStore]] — front with an HDFS
    * -semantics layer there). */
  def writeTarShards(media: Dataset[MediaRow], dir: String,
      nShards: Int): Seq[(Int, Long, Long)] = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val hconf = media.sparkSession.sparkContext.hadoopConfiguration
    val confEntries: Array[(String, String)] = {
      val it = hconf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    def fsFor(conf: org.apache.hadoop.conf.Configuration) =
      new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fsFor(hconf).mkdirs(new org.apache.hadoop.fs.Path(dir))
    media
      .withColumn("shard", pmod(xxhash64(col("id")), lit(nShards)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .select(col("id"), col("mediaType"), col("bytes"), col("meta"),
        col("shard"))
      .rdd.mapPartitions { rowIt =>
        val rows = rowIt.map(r => (r.getLong(0), r.getString(1),
          r.getAs[Array[Byte]](2), r.getMap[String, String](3).toMap,
          r.getInt(4)))
        // a hash-partitioned task may hold several shard values;
        // stream each run of equal shard ids into its own tar
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = fsFor(conf)
        var cur: Int = -1
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var samples = 0L
        var written = 0L
        val results = Seq.newBuilder[(Int, Long, Long)]
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // end-of-archive blocks
          out.close()
          val dst = new org.apache.hadoop.fs.Path(dir,
            f"shard-$cur%05d.tar")
          // rename is the commit; a retried/speculative attempt
          // replaces with identical bytes (content is deterministic).
          // The exists/delete/rename sequence is check-then-act, so a
          // concurrent attempt can rename into the window — a failed
          // rename with a correctly-sized dst is that attempt's
          // identical commit, a benign no-op, not a task failure.
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(tmp, dst)) {
            val committed =
              try fs.getFileStatus(dst).getLen == written + 1024
              catch { case _: java.io.FileNotFoundException => false }
            require(committed, s"rename $tmp -> $dst failed")
            try fs.delete(tmp, false)
            catch { case _: java.io.IOException => () }
          }
          results += ((cur, samples, written + 1024))
          out = null
        }
        val counting = rows.map { case (id, mt, bytes, meta, shard) =>
          if (shard != cur) {
            close()
            cur = shard
            samples = 0L; written = 0L
            tmp = new org.apache.hadoop.fs.Path(dir,
              f".shard-$cur%05d.tar.tmp-${java.util.UUID.randomUUID}")
            out = new java.io.BufferedOutputStream(fs.create(tmp, true),
              1 << 16)
          }
          val metaJson = (Seq(
            s""""id":$id""", s""""media_type":"${jsonEscape(mt)}"""",
            s""""n_bytes":${bytes.length}""") ++
            meta.toSeq.sortBy(_._1).map { case (k, v) =>
              s""""${jsonEscape(k)}":"${jsonEscape(v)}""""
            }).mkString("{", ",", "}")
          writeEntry(out, s"$id.${extOf(mt)}", bytes)
          val jb = metaJson.getBytes(UTF_8)
          writeEntry(out, s"$id.json", jb)
          samples += 1
          written += 1024 + bytes.length + jb.length +
            (512 - bytes.length % 512) % 512 + (512 - jb.length % 512) % 512
        }
        counting.foreach(_ => ())
        close()
        results.result().iterator
      }.collect().toSeq.sortBy(_._1)
  }

  /** Distributed WebDataset reader — the loader side of
    * [[writeTarShards]] as a Spark source: one task per shard file,
    * each STREAMING its tar (512-byte header → payload → padding,
    * never more than one sample buffered) and pairing each
    * `<key>.<ext>` payload with the `<key>.json` metadata entry the
    * writer put right after it. Returns (shard, id, ext, bytes,
    * meta_json) — exported corpora are re-ingestable without any
    * local-disk detour (same Hadoop FileSystem plumbing as the
    * writer, so HDFS/local alike).
    *
    * Scale: the shard list is a driver-side file listing (one row per
    * shard, like any file source); payload bytes flow straight from
    * the FSDataInputStream to the output row. A malformed pairing
    * (payload without its json) fails loudly rather than silently
    * skewing samples. */
  def readTarShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs0 = dirPath.getFileSystem(hconf)
    val shardRe = ".*/shard-(\\d{5})\\.tar$".r
    val shards = fs0.listStatus(dirPath).toSeq
      .map(_.getPath.toString)
      .collect { case p @ shardRe(_) => p }
      .sorted
    val confEntries: Array[(String, String)] = {
      val it = hconf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    spark.createDataset(shards)
      .repartition(math.max(1, shards.size))
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf)
        val shardNo = p match { case shardRe(n) => n.toInt; case _ => -1 }
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(fs.open(path), 1 << 16))
        // the stream must close even when the consumer abandons the
        // iterator (limit/take) or a malformed shard throws mid-walk —
        // otherwise each such task leaks a file handle
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        def readEntry(): Option[(String, Array[Byte])] = {
          val hdr = new Array[Byte](512)
          in.readFully(hdr)
          if (hdr(0) == 0) { in.close(); None }
          else {
            val name = new String(hdr, 0, 100, UTF_8).takeWhile(_ != 0)
            val size = java.lang.Long.parseLong(
              new String(hdr, 124, 12, UTF_8)
                .takeWhile(c => c != 0 && c != ' '), 8)
            // the USTAR octal size field allows up to 8 GiB, but a
            // sample must materialize as ONE byte array (≤ 2 GiB on
            // the JVM) — silently truncating the size would allocate
            // a wrong-sized buffer AND desynchronize the 512-byte
            // walk for every entry after it
            require(size >= 0 && size <= Int.MaxValue,
              s"tar shard $p: entry '$name' declares $size bytes — " +
                "larger than one JVM byte array can hold; this reader " +
                "only accepts sample-sized entries")
            val data = new Array[Byte](size.toInt)
            in.readFully(data)
            val pad = ((512 - size % 512) % 512).toInt
            // readFully, not skipBytes: skip may return short
            if (pad > 0) in.readFully(new Array[Byte](pad))
            Some((name, data))
          }
        }
        new Iterator[(Int, Long, String, Array[Byte], String)] {
          private var nextRow: (Int, Long, String, Array[Byte], String) = _
          private var done = false
          advance()
          private def advance(): Unit =
            readEntry() match {
              case None => done = true
              case Some((pname, pdata)) =>
                val dot = pname.lastIndexOf('.')
                require(dot > 0, s"tar shard $p: unpaired entry '$pname'")
                val key = pname.substring(0, dot)
                val ext = pname.substring(dot + 1)
                val meta = readEntry() match {
                  case Some((jn, jd)) if jn == s"$key.json" =>
                    new String(jd, UTF_8)
                  case other => throw new java.io.IOException(
                    s"tar shard $p: entry '$pname' not followed by " +
                      s"'$key.json' (got ${other.map(_._1)})")
                }
                nextRow = (shardNo, key.toLong, ext, pdata, meta)
            }
          def hasNext: Boolean = !done
          def next(): (Int, Long, String, Array[Byte], String) = {
            val r = nextRow
            advance()
            r
          }
        }
      }
      .toDF("shard", "id", "ext", "bytes", "meta_json")
  }

  /** Parse a tar produced by [[writeTarShards]] (or any USTAR
    * archive of regular files) back to (name, bytes) entries — the
    * loader side, and the round-trip half of the spec. */
  def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      if (bytes(off) == 0) done = true // end-of-archive zero block
      else {
        val name = new String(bytes, off, 100, UTF_8).takeWhile(_ != 0)
        val sizeStr = new String(bytes, off + 124, 12, UTF_8)
          .takeWhile(c => c != 0 && c != ' ')
        val size = java.lang.Long.parseLong(sizeStr, 8)
        // same oversize guard as the distributed reader — and a
        // truncation guard: copyOfRange would silently ZERO-PAD past
        // the end of a short archive instead of failing
        require(size >= 0 && size <= Int.MaxValue,
          s"tar entry '$name' declares $size bytes — larger than one " +
            "JVM byte array can hold")
        require(off + 512 + size <= bytes.length,
          s"tar entry '$name' declares $size bytes but the archive " +
            s"ends ${bytes.length - off - 512} bytes after its header")
        val data = java.util.Arrays.copyOfRange(bytes,
          off + 512, off + 512 + size.toInt)
        out += ((name, data))
        off += 512 + ((size + 511) / 512).toInt * 512
      }
    }
    out.result()
  }
}
