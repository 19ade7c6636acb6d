package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.classic.ClassicUpdate
import graft.operators.Middle
import graft.sources.{OsmText, OsmXml}

/** Port of tests/bdd/flex/relation-changes.feature (an area table fed
  * by process_relation for type=multipolygon, geom not_null) and
  * tests/bdd/flex/missing-nodes.feature (ways insert the linestring of
  * their found nodes; the missing refs are reported).
  *
  * Every relation-changes scenario is the same declarative claim: the
  * table is the set of relations whose CURRENT entity state assembles
  * into a valid multipolygon — type change, member change, way change
  * and node move all fall out of recomputing over the updated frames.
  */
class RelationChangesSpec extends SparkSpecBase {

  import spark.implicits._

  /** osm2pgsql_test_relations: (area_id, tags) for relations with
    * type=multipolygon whose assembled multipolygon is non-null. */
  private def relTable(osm: OsmXml.OsmDataFrames)
      : Array[(Long, Map[String, String])] = {
    val mp = osm.relations
      .where($"tags".getItem("type") === "multipolygon")
    val members = mp
      .select($"id".as("rid"), posexplode($"members").as(Seq("mpos", "m")))
      .where($"m.mtype" === "w")
    val resolved = Middle.resolveAllWayCoords(osm)
    val assembled = members
      .join(resolved, col("m.ref") === col("rwid"))
      .groupBy($"rid")
      .agg(
        transform(array_sort(collect_list(struct($"mpos", $"wlons"))),
          s => s.getField("wlons")).as("mlons"),
        transform(array_sort(collect_list(struct($"mpos", $"wlats"))),
          s => s.getField("wlats")).as("mlats"))
    val mpUdf = udf((lons: Seq[Seq[Double]], lats: Seq[Seq[Double]]) =>
      graft.geom.FromOsm.createMultiPolygon(
        lons.zip(lats).map { case (lo, la) =>
          lo.zip(la).map { case (x, y) => graft.geom.Pt(x, y) }
        }) match {
        case _: graft.geom.NullGeom => false
        case _                      => true
      })
    mp.select($"id", $"tags")
      .join(assembled, $"id" === $"rid")
      .where(mpUdf($"mlons", $"mlats"))
      .select(-$"id", $"tags") // area table: relations → negative ids
      .as[(Long, Map[String, String])].collect()
  }

  // triangle grid (explicit coords): n10/n11 on y=10.0, n12/n13 above
  private val grid = """
    n10 v1 dV x10.0 y10.0
    n11 v1 dV x10.1 y10.0
    n12 v1 dV x10.1 y10.1
    n13 v1 dV x10.0 y10.1
  """

  private def rows(base: String, diff: Option[String]): Int = {
    val b = OsmText.toFrames(spark, grid + base)
    val osm = diff.fold(b)(d =>
      ClassicUpdate.applyChanges(b, OsmText.toFrames(spark, d, change = true)))
    relTable(osm).length
  }

  test("changing type adds relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Mw20@,w21@
    """
    assert(rows(base, None) == 0)
    assert(rows(base, Some("r30 v2 dV Ttype=multipolygon Mw20@,w21@")) == 1)
  }

  test("changing way adds relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 0) // ring n10..n12..n13 unclosed
    assert(rows(base, Some("w21 v2 dV Nn12,n13,n10")) == 1)
  }

  test("changing node adds relation") {
    val base = """
      n14 v1 dV x10.2 y10.0
      w20 v1 dV Nn10,n11,n14
      w21 v1 dV Nn14,n10
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 0) // all three on y=10.0: zero area
    assert(rows(base, Some("n14 v2 dV x10.05 y10.1")) == 1)
  }

  test("changing memberlist adds relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Ttype=multipolygon Mw20@
    """
    assert(rows(base, None) == 0)
    assert(rows(base,
      Some("r30 v2 dV Ttype=multipolygon Mw20@,w21@")) == 1)
  }

  test("changing type deletes relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 1)
    assert(rows(base, Some("r30 v2 dV Mw20@,w21@")) == 0)
  }

  test("changing ways in valid relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 1)
    // unclosed after change → gone; reordered but closed → stays
    assert(rows(base, Some("w21 v2 dV Nn12,n13")) == 0)
    assert(rows(base, Some("w21 v2 dV Nn10,n13,n12")) == 1)
  }

  test("changing nodes in a valid relation") {
    val base = """
      n14 v1 dV x10.05 y10.1
      w20 v1 dV Nn10,n11,n14
      w21 v1 dV Nn14,n10
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 1)
    assert(rows(base, Some("n14 v2 dV x10.2 y10.0")) == 0) // collinear
    assert(rows(base, Some("n14 v2 dV x10.07 y10.15")) == 1)
  }

  test("changing memberlist in valid relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Ttype=multipolygon Mw20@,w21@
    """
    assert(rows(base, None) == 1)
    assert(rows(base, Some("r30 v2 dV Ttype=multipolygon Mw20@")) == 0)
    assert(rows(base,
      Some("r30 v2 dV Ttype=multipolygon Mw21@,w20@")) == 1)
  }

  test("changing tags keeps relation") {
    val base = """
      w20 v1 dV Nn10,n11,n12
      w21 v1 dV Nn12,n13,n10
      r30 v1 dV Ttype=multipolygon,natural=wood Mw20@,w21@
    """
    val b = OsmText.toFrames(spark, grid + base)
    val before = relTable(b)
    assert(before.toSeq == Seq(
      (-30L, Map("type" -> "multipolygon", "natural" -> "wood"))))

    val after = relTable(ClassicUpdate.applyChanges(b, OsmText.toFrames(
      spark, "r30 v2 dV Ttype=multipolygon,landuse=forest Mw20@,w21@",
      change = true)))
    assert(after.toSeq == Seq(
      (-30L, Map("type" -> "multipolygon", "landuse" -> "forest"))))
  }

  test("missing-nodes.feature: missing node is reported") {
    val osm = OsmText.toFrames(spark, """
      n10 v1 dV x10.0 y10.0
      n11 v1 dV x10.0 y11.0
      w20 v1 dV Thighway=primary Nn10,n11,n12,n13
    """)
    // the line table still gets one row from the found nodes
    val lines = Middle.resolveAllWayCoords(osm)
    assert(lines.count() == 1)
    assert(lines.select($"wlons").as[Seq[Double]].head() == Seq(10.0, 10.0))

    // and the missing refs are reported per way, in order
    val missing = Middle.missingWayNodes(osm.ways, "id", "nodes",
      osm.nodes, "id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(missing == Map(20L -> Seq(12L, 13L)))
  }
}
