package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe for the flex APPEND flow (not part of the
  * driver contract): import Liechtenstein replicated N× with shifted
  * ids through the reference's test_output_flex.lua, persist the
  * landed tables + middle as parquet (the stored state), then apply
  * a FIXED 100-node change through [[graft.flex.FlexRunner.append]].
  *
  * The scale claim under test: append cost is dominated by the
  * dependency-closure joins over the persisted middle (prunable by
  * id-bucketing on a real cluster) plus change-proportional
  * re-derive work — so with the change held constant, append time
  * must grow FAR slower than the N× import, and the touched-row
  * delta must stay constant. */
object AppendScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    val osm0 = graft.sources.OsmPbf.read(spark, pbf)

    def shift(df: DataFrame, i: Long): DataFrame = {
      val off = i * 100000000L
      var d = df.withColumn("id", col("id") + off)
      if (d.columns.contains("nodes"))
        d = d.withColumn("nodes", transform(col("nodes"), r => r + off))
      if (d.columns.contains("members"))
        d = d.withColumn("members", transform(col("members"),
          m => struct(m.getField("mtype").as("mtype"),
            (m.getField("ref") + off).as("ref"),
            m.getField("role").as("role"))))
      d
    }
    val osm = graft.sources.OsmXml.OsmDataFrames(
      (0L until mult.toLong).map(shift(osm0.nodes, _))
        .reduce(_ unionByName _),
      (0L until mult.toLong).map(shift(osm0.ways, _))
        .reduce(_ unionByName _),
      (0L until mult.toLong).map(shift(osm0.relations, _))
        .reduce(_ unionByName _))

    // arg(1): config path — test_output_flex.lua (single-stage) by
    // default; public-transport.lua exercises TWO-STAGE append, where
    // the stage-2 relation replay must stay bounded by the marks
    val cfgPath = args.lift(1).getOrElse(
      "/root/reference/tests/data/test_output_flex.lua")
    val cfgName = java.nio.file.Paths.get(cfgPath).getFileName.toString
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfgPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val mkCfg = () => new graft.flex.LuaFlexConfig(src,
      cfgName, properties = Map("updatable" -> "true"))

    // ---- import, persist the stored state like a real deployment ----
    val base = s"/tmp/append_probe_${cfgName.stripSuffix(".lua")}_$mult"
    val t0 = System.nanoTime()
    val r = graft.flex.FlexRunner.run(mkCfg(),
      graft.flex.Enrich.forFlex(osm, "create"))
    r.tables.foreach { case (n, tr) =>
      tr.rows.write.mode("overwrite").parquet(s"$base/tables/$n") }
    osm.nodes.write.mode("overwrite").parquet(s"$base/mid/nodes")
    osm.ways.write.mode("overwrite").parquet(s"$base/mid/ways")
    osm.relations.write.mode("overwrite").parquet(s"$base/mid/relations")
    val tImport = (System.nanoTime() - t0) / 1e9

    val prevTables = r.tables.keys.map(n =>
      n -> spark.read.parquet(s"$base/tables/$n")).toMap
    val prevMiddle = graft.sources.OsmXml.OsmDataFrames(
      spark.read.parquet(s"$base/mid/nodes"),
      spark.read.parquet(s"$base/mid/ways"),
      spark.read.parquet(s"$base/mid/relations"))

    // ---- the FIXED change: move 100 tagged nodes of replica 0 ----
    val changeIds = prevMiddle.nodes
      .where(col("id") < 100000000L && size(col("tags")) > 0)
      .select("id").limit(100)
    val chgNodes = prevMiddle.nodes
      .join(changeIds, Seq("id"), "left_semi")
      .withColumn("version", col("version") + 1)
      .withColumn("lat", col("lat") + lit(0.0001))
      .withColumn("action", lit("modify"))
    val change = graft.sources.OsmXml.OsmDataFrames(
      chgNodes,
      prevMiddle.ways.limit(0).withColumn("action", lit("modify")),
      prevMiddle.relations.limit(0).withColumn("action", lit("modify")))

    val t1 = System.nanoTime()
    val ar = graft.flex.FlexRunner.append(mkCfg(), prevTables,
      prevMiddle, change)
    // count the final tables (forces the whole append plan) and the
    // expire set of this change
    val counts = ar.result.tables.map { case (n, tr) =>
      n -> tr.rows.count() }
    val tAppend = (System.nanoTime() - t1) / 1e9

    println(f"[append-scale] cfg=$cfgName mult=$mult%d " +
      f"import=$tImport%.1fs append=$tAppend%.1fs " +
      counts.toSeq.sortBy(_._1)
        .map { case (n, c) => s"$n=$c" }.mkString(" "))
    spark.stop()
  }
}
