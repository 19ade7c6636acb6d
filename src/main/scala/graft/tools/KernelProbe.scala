package graft.tools

import graft.sources.{Gif, Multimodal}

/** Dev-only microbenchmark for the media decode kernels — isolates
  * per-image CPU cost from Spark scheduling (round-16 q144 triage). */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    def genRgb(id: Long): (Int, Int, Array[Int]) = {
      val w = 9 * (1 + id % 2).toInt
      val h = 8 * (1 + id % 3).toInt
      val bw = w / 9; val bh = h / 8
      val rgb = new Array[Int](w * h * 3)
      var i = 0
      while (i < w * h) {
        val b = ((i / w) / bh) * 9 + (i % w) / bw
        val v = ((id * 41 + b.toLong * 17) % 256).toInt
        rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
        i += 1
      }
      (w, h, rgb)
    }
    // warm
    (0 until 200).foreach { id =>
      val (w, h, rgb) = genRgb(id.toLong)
      Gif.decodeGif(Gif.encodeGif(w, h, rgb))
    }
    var t0 = System.nanoTime()
    val encoded = (0 until n).map { id =>
      val (w, h, rgb) = genRgb(id.toLong); Gif.encodeGif(w, h, rgb)
    }
    val tEnc = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    var sink = 0L
    encoded.foreach { b =>
      val (w, h, rgb) = Gif.decodeGif(b)
      sink += rgb(0) + w + h
    }
    val tDec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    encoded.foreach { b =>
      val (w, h, px) = Multimodal.BinaryDecoder.decode("image", b)
      sink += px(0).toLong + w + h
    }
    val tFull = (System.nanoTime() - t0) / 1e9
    // 32-thread decode: the shape the 32-core local executor runs
    val nThreads = 32
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val acc = new java.util.concurrent.atomic.AtomicLong()
    t0 = System.nanoTime()
    val futs = (0 until nThreads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var s = 0L
          var i = t
          while (i < n) {
            val (w, h, px) = Multimodal.BinaryDecoder.decode("image", encoded(i))
            s += px(0).toLong + w + h
            i += nThreads
          }
          acc.addAndGet(s)
        }
      })
    }
    futs.foreach(_.get())
    val tPar = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    println(f"n=$n encode=$tEnc%.3f s decode=$tDec%.3f s binaryDecode=$tFull%.3f s par32=$tPar%.3f s sink=$sink acc=${acc.get()}")

    if (args.contains("spark")) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val rows = (0 until n).map { id =>
        Multimodal.MediaRow(id.toLong, "image", encoded(id), Map.empty)
      }
      val dir = java.nio.file.Files.createTempDirectory("kprobe").toString
      rows.toDS().repartition(32).write.mode("overwrite").parquet(dir)
      val media = spark.read.parquet(dir).as[Multimodal.MediaRow]
      def time(tag: String)(f: => Long): Unit = {
        f // warm
        val s0 = System.nanoTime()
        val r = f
        println(f"$tag%-28s ${(System.nanoTime() - s0) / 1e9}%.3f s (rows=$r)")
      }
      time("dHash64.count") {
        Multimodal.dHash64(media).toDF("doc_id", "width", "height", "dhash").count()
      }
      time("mapPartitions-bytes-only") {
        media.select("id", "bytes").as[(Long, Array[Byte])].mapPartitions { it =>
          it.map { case (id, b) =>
            val (w, h, px) = Multimodal.BinaryDecoder.decode("image", b)
            (id, w, h, px.length)
          }
        }.count()
      }
      time("encoder-only (no decode)") {
        media.mapPartitions(it => it.map(r => r.bytes.length.toLong)).count()
      }
      spark.stop()
    }
  }
}
