package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.model.{OsmMember, OsmNode, OsmRelation, OsmWay}
import graft.sources.O5m

/** spark.read.format("osm") — the DataSource V2 surface: split-level
  * PBF partitions, unified entity schema, column pruning, type/bbox
  * pushdown (pruning only; residual filters keep correctness). */
class OsmDataSourceV2Spec extends SparkSpecBase {

  import spark.implicits._

  private val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"

  private def mkO5m(): String = {
    val nodes = Seq(
      OsmNode(1, lon = 9.5, lat = 47.1, tags = Map("amenity" -> "cafe")),
      OsmNode(2, lon = 120.0, lat = -10.0))
    val ways = Seq(OsmWay(10, nodes = Seq(1L, 2L),
      tags = Map("highway" -> "path")))
    val rels = Seq(OsmRelation(20,
      members = Seq(OsmMember("w", 10, "outer"))))
    val dir = Files.createTempDirectory("graft-dsv2")
    val p = dir.resolve("t.o5m")
    Files.write(p, O5m.encode(nodes, ways, rels))
    p.toString
  }

  test("unified frame over o5m: types, nested columns") {
    val df = spark.read.format("osm").load(mkO5m())
    val byType = df.groupBy("type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("n" -> 2L, "w" -> 1L, "r" -> 1L))
    val w = df.where($"type" === "w").select($"nodes").as[Seq[Long]].head()
    assert(w == Seq(1L, 2L))
    val m = df.where($"type" === "r")
      .select(explode($"members").as("m")).select($"m.mtype", $"m.ref", $"m.role")
      .as[(String, Long, String)].head()
    assert(m == (("w", 10L, "outer")))
    val cafe = df.where($"type" === "n" && $"id" === 1)
      .select($"tags"("amenity")).as[String].head()
    assert(cafe == "cafe")
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("osm").load(mkO5m()).select($"id")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.output.map(_.name)
    }
    assert(scans.nonEmpty && scans.head == Seq("id"))
    assert(df.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L, 20L))
  }

  test("nested member access works under schema pruning") {
    val df = spark.read.format("osm").load(mkO5m())
    // if Spark prunes members to struct<ref:long>, the reader must
    // emit ordinals per the REQUIRED schema, not the full one
    val refs = df.where($"type" === "r")
      .select(explode($"members").as("m")).select($"m.ref")
      .as[Long].collect()
    assert(refs.toSeq == Seq(10L))
    val roles = df.where($"type" === "r")
      .select(explode($"members").as("m")).select($"m.role", $"m.mtype")
      .as[(String, String)].collect()
    assert(roles.toSeq == Seq(("outer", "w")))
  }

  test("pbf: one partition per blob, golden counts match the RDD reader") {
    assume(Files.exists(Paths.get(pbf)))
    val df = spark.read.format("osm").load(pbf)
    val counts = df.groupBy("type").count().as[(String, Long)]
      .collect().toMap
    assert(counts("n") == 65733L)
    assert(counts("w") > 5000 && counts("r") > 100)
    // split-level parallelism: at least a handful of blob partitions
    assert(df.rdd.getNumPartitions > 1)
  }

  test("type pushdown skips groups; bbox pushdown prunes nodes") {
    assume(Files.exists(Paths.get(pbf)))
    val base = spark.read.format("osm").load(pbf)
    val ways = base.where($"type" === "w")
    assert(ways.count() > 5000)
    assert(ways.select($"id").distinct().count() == ways.count())
    // bbox (the --bbox analog): counts match a residual-only filter
    val bboxed = base.where($"type" === "n" &&
      $"lon" > 9.5 && $"lon" < 9.6 && $"lat" > 47.1 && $"lat" < 47.2)
    val residualOnly = base.where($"type" === "n").collect()
      .count { r =>
        val lon = r.getAs[Double]("lon"); val lat = r.getAs[Double]("lat")
        lon > 9.5 && lon < 9.6 && lat > 47.1 && lat > 47.1 && lat < 47.2
      }
    assert(bboxed.count() == residualOnly && residualOnly > 0)
  }

  test("xml files read through the same format") {
    val dir = Files.createTempDirectory("graft-dsv2x")
    val p = dir.resolve("t.osm")
    Files.write(p,
      """<osm><node id="7" lat="1.5" lon="2.5" version="3"/></osm>"""
        .getBytes("UTF-8"))
    val df = spark.read.format("osm").load(p.toString)
    val r = df.select($"type", $"id", $"version", $"lon", $"lat")
      .as[(String, Long, Int, Double, Double)].head()
    assert(r == (("n", 7L, 3, 2.5, 1.5)))
  }
}
