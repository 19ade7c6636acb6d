package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe (not part of the driver contract): self-union
  * the sf0.1 tables N× with shifted ids and time the fan-out-bounded
  * operators, to check the equi-join bounds empirically rather than
  * by argument. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = Tables.documents(spark, sfDir)
    val n0 = docs0.count()
    val docs = (0 until mult).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", when(lit(i) === 0, col("text"))
          .otherwise(concat(col("text"), lit(s" v$i"))))
    }.reduce(_ unionByName _).cache()
    val emb0 = Tables.embeddings(spark, sfDir)
    val emb = (0 until mult).map { i =>
      emb0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
    }.reduce(_ unionByName _).cache()
    println(s"[scale] docs=${docs.count()} (${n0}x$mult) vecs=${emb.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name ${(System.nanoTime()-t0)/1e9}%.1fs rows=$r")
    }
    time("minhash_lsh_pairs")(
      graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    time("ngram_jaccard")(
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text").count())
    time("semantic_dedup")(
      graft.operators.Dedup.semanticDedup(
        emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 0.95).count())
    time("srp_neardup")(
      graft.operators.Dedup.srpBlockedNearDup(
        emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 0.25).count())
    time("pq_topk")(
      graft.operators.Similarity.pqTopK(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
          .where(col("id") < 8),
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), 5).count())
    time("dup_span_coverage")(
      graft.operators.Dedup.dupSpanCoverage(docs, "doc_id", "text").count())
    // q52's shape: LSH pairs → large-star/small-star CC. The 20×/50×
    // self-union makes every original doc a duplicate clique, so the
    // cluster count must stay ~n0 while edges grow ~mult² per clique —
    // the probe checks rounds stay logarithmic, not edge-linear.
    time("neardup_clusters_cc")(
      graft.operators.Dedup.nearDupClusters(docs, "doc_id", "text", 0.8)
        .count())
    // full curation chain at 20×, with stage persistence (the shared
    // stage frames are referenced twice each; unpersisted they'd be
    // recomputed per reference)
    time("curate_pipeline") {
      val isBench = substring(md5(col("doc_id").cast("string")), 1, 2) <
        lit("40")
      val persisted = scala.collection.mutable.ArrayBuffer.empty[
        org.apache.spark.sql.DataFrame]
      val n = graft.operators.TrainingData.curate(
        docs.where(!isBench), "doc_id", "text", "source", "n_chars",
        docs.where(isBench), "text",
        quota = Map.empty, defaultQuota = 1000, windowTokens = 2048,
        persistStages = true, onStagePersist = persisted += _).count()
      persisted.foreach(_.unpersist())
      n
    }
    // windowed sessionization over the 20× event stream
    val ev0 = Tables.events(spark, sfDir)
    val ev = (0 until mult).map { i =>
      ev0.withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000L))
    }.reduce(_ unionByName _)
    time("sessionize")(graft.operators.Sessions
      .sessionStats(ev, "user_id", "ts", "event_id", 1800).count())
    // OSM reader throughput: the same PBF 8× through the blob-parallel
    // decoder + the way-coordinate resolve join (ids collide across
    // copies — fine, this probes parse + join volume, not semantics)
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    if (new java.io.File(pbf).exists()) {
      time("osm_pbf_x8_resolve") {
        val osm = graft.sources.OsmSource.read(spark, Seq.fill(8)(pbf))
        val n = graft.operators.Middle.resolveAllWayCoords(osm).count()
        osm.unpersistBacking()
        n
      }
    }
    spark.stop()
  }
}
