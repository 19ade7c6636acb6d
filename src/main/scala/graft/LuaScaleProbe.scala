package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe for the Lua flex runtime (not part of the
  * driver contract): replicate Liechtenstein N× with shifted ids and
  * run the reference's simple.lua through [[graft.flex.LuaFlexConfig]]
  * end to end. Checks the two scale claims empirically: output
  * cardinality is exactly N× (the per-partition Lua states don't
  * drop or duplicate work) and wall-clock grows sublinearly in N up
  * to core saturation (the states run parallel, unlike the
  * reference's mutex-serialized single state). */
object LuaScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    val osm0 = graft.sources.OsmPbf.read(spark, pbf)

    // shift node ids AND way node-ref arrays / relation member refs
    // consistently so resolution works per replica
    def shift(df: DataFrame, i: Long): DataFrame = {
      val off = i * 100000000L
      var d = df.withColumn("id", col("id") + off)
      if (d.columns.contains("nodes"))
        d = d.withColumn("nodes",
          transform(col("nodes"), r => r + off))
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

    // arg(1): config path — simple.lua (single-stage) by default;
    // public-transport.lua exercises the TWO-STAGE path, where the
    // relation replay payload must scale with the marked member sets
    // (O(marks × fan-in)), never with |relations|
    val cfgPath = args.lift(1).getOrElse(
      "/root/reference/flex-config/simple.lua")
    val cfgName = java.nio.file.Paths.get(cfgPath).getFileName.toString
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfgPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val t0 = System.nanoTime()
    val enriched = graft.flex.Enrich.forFlex(osm, "create")
    val r = graft.flex.FlexRunner.run(
      new graft.flex.LuaFlexConfig(src, cfgName), enriched)
    val counts = r.tables.map { case (n, tr) => n -> tr.rows.count() }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[lua-scale] cfg=$cfgName mult=$mult%d time=$dt%.1fs " +
      counts.toSeq.sortBy(_._1)
        .map { case (n, c) => s"$n=$c" }.mkString(" "))
    // 1× pins per config (exact-N× cardinality check): simple.lua
    // from the typed-port equality; public-transport.lua from the 1×
    // probe run (two-stage — lines carries the stage-2 rel_refs)
    val base: Map[String, Long] = cfgName match {
      case "simple.lua" => Map("pois" -> 1531L, "restaurants" -> 31L,
        "ways" -> 2990L, "polygons" -> 4142L)
      case "public-transport.lua" => Map("lines" -> 2790L,
        "routes" -> 17L, "stop_areas" -> 1L, "stops" -> 8L)
      case _ => Map.empty
    }
    base.foreach { case (n, c) =>
      val got = counts(n)
      require(got == c * mult,
        s"$n: expected ${c * mult} (=$c x $mult), got $got")
    }
    println(s"[lua-scale] cardinality exact at ${mult}x")
    spark.stop()
  }
}
