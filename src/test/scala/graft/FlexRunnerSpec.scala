package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._
import graft.operators.Middle
import graft.sources.OsmText

/** End-to-end FlexConfig execution through FlexRunner: callbacks →
  * coercion → NOT NULL soft errors → expire outputs, the
  * output-flex.cpp process loop as one declarative plan per table. */
class FlexRunnerSpec extends SparkSpecBase {

  import spark.implicits._

  private val eo = FlexExpireOutput("eo", table = Some("tiles"),
    maxzoom = 12, minzoomOpt = Some(11))

  private object Config extends FlexConfig {
    val pois = FlexTableDef("pois", FlexIds.Node, Seq(
      FlexColumn("name", FlexType.Text),
      FlexColumn("rating", FlexType.Int2),
      FlexColumn("oneway", FlexType.Direction),
      FlexColumn("geom", FlexType.Point, notNull = true,
        expire = Seq(FlexExpireRef(eo)))))
    val lines = FlexTableDef("lines", FlexIds.Way, Seq(
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))
    override def tables = Seq(pois, lines)

    override def processNodes(nodes: DataFrame): Map[String, DataFrame] = {
      val pt = udf((lon: Double, lat: Double) =>
        graft.geom.Ewkb.encode(graft.geom.GeomOps.transform(
          graft.geom.Point(graft.geom.Pt(lon, lat), graft.geom.Srid.WGS84),
          graft.geom.Srid.WebMercator)))
      Map("pois" -> nodes.where(size($"tags") > 0)
        .select($"id".as("osm_id"),
          $"tags".getItem("name").as("name"),
          $"tags".getItem("rating").as("rating"),
          $"tags".getItem("oneway").as("oneway"),
          when($"tags".getItem("broken").isNull,
            pt($"lon", $"lat")).as("geom")))
    }

    override def processWays(ways: DataFrame): Map[String, DataFrame] =
      // refs only; geometry resolution happens in the caller's frame
      Map("lines" -> ways.where(size($"tags") > 0)
        .select($"id".as("osm_id"), $"tags", $"__geom".as("geom")))
  }

  test("runner: coercion, soft errors and expire in one pass") {
    val osm0 = OsmText.toFrames(spark, """
      n1 v1 dV Tname=cafe,rating=4,oneway=yes x10.0 y10.0
      n2 v1 dV Tname=bar,rating=99999,oneway=nope x10.3 y10.0
      n3 v1 dV Tname=broken,broken=yes x10.6 y10.0
      n4 v1 dV x11.0 y11.0
      w20 v1 dV Thighway=primary Nn1,n2
      w21 v1 dV Thighway=service Nn4
    """)
    // pre-resolve way linestrings into a column the config can use
    val lineUdf = udf((lons: Seq[Double], lats: Seq[Double]) =>
      if (lons == null) null
      else graft.geom.FromOsm.createLineString(
        lons.zip(lats).map { case (x, y) => graft.geom.Pt(x, y) },
        graft.geom.Srid.WebMercator) match {
        case _: graft.geom.NullGeom => null
        case g                      => graft.geom.Ewkb.encode(g)
      })
    val resolved = Middle.resolveAllWayCoords(osm0)
    val ways = osm0.ways
      .join(resolved, $"id" === $"rwid", "left")
      .withColumn("__geom", lineUdf($"wlons", $"wlats"))
    val osm = osm0.copy(ways = ways)

    val r = FlexRunner.run(Config, osm)

    val pois = r.tables("pois").rows
      .select($"osm_id", $"name", $"rating", $"oneway")
      .as[(Long, String, Option[Short], Option[Short])]
      .collect().sortBy(_._1)
    // n3's geom is NULL (not_null soft error) → dropped; n4 untagged
    assert(pois.map(_._1).toSeq == Seq(1L, 2L))
    // int2 coercion: 99999 out of range → NULL; direction: nope → NULL
    assert(pois(0) == ((1L, "cafe", Some(4: Short), Some(1: Short))))
    assert(pois(1) == ((2L, "bar", None, None)))

    // the observation carries total inserts and the violation count
    val ins = r.tables("pois").inserts.get
    assert(ins("n_rows") == 3L && ins("n_null_violations") == 1L)

    // lines: w21 has one ref → null line → dropped
    val lines = r.tables("lines").rows.select($"osm_id")
      .as[Long].collect().toSeq
    assert(lines == Seq(20L))

    // expire: the two kept pois dirty z12 tiles, rolled up to z11
    val tiles = r.expire("eo").select($"zoom", $"x", $"y")
      .as[(Int, Long, Long)].collect()
    assert(tiles.map(_._1).toSet == Set(11, 12))
    assert(tiles.count(_._1 == 12) >= 2) // two distinct points
  }

  test("runner: insert into undefined table is rejected") {
    object Bad extends FlexConfig {
      override def tables = Seq(
        FlexTableDef("t", FlexIds.Node, Seq(FlexColumn("v", FlexType.Text))))
      override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
        Map("nope" -> nodes.select($"id".as("osm_id"),
          $"id".cast("string").as("v")))
    }
    val osm = OsmText.toFrames(spark, "n1 v1 dV x0 y0")
    assert(intercept[IllegalArgumentException] {
      FlexRunner.run(Bad, osm)
    }.getMessage.contains("undefined table 'nope'"))
  }
}
