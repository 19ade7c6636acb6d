package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.classic.ClassicUpdate
import graft.expressions.GeomExpressions.stGeometryTypeN
import graft.flex.{Coerce, FlexType}
import graft.operators.Middle
import graft.sources.{OsmText, OsmXml}

/** Ports of tests/bdd/flex/multigeom.feature (geometry-column typing:
  * 'geometry' keeps what it's given, 'multipolygon' wraps single
  * polygons, splitting via the geometries() iterator = st_split_multi
  * explode), untagged.feature (process_untagged_* callbacks) and
  * nogeom.feature (tables without geometry update fine). */
class FlexGeomColumnSpec extends SparkSpecBase {

  import spark.implicits._

  // multigeom 1.0 grid: two unit squares
  //   | 13 | 12 |   | 17 | 16 |
  //   | 10 | 11 |   | 14 | 15 |
  private val grid = """
    n10 v1 dV x0 y0
    n11 v1 dV x1 y0
    n12 v1 dV x1 y1
    n13 v1 dV x0 y1
    n14 v1 dV x3 y0
    n15 v1 dV x4 y0
    n16 v1 dV x4 y1
    n17 v1 dV x3 y1
  """
  private val mgBase = grid + """
    w20 v1 dV Tnatural=water,name=poly Nn10,n11,n12,n13,n10
    w21 v1 dV Nn10,n11,n12,n13,n10
    w22 v1 dV Nn14,n15,n16,n17,n14
    r30 v1 dV Ttype=multipolygon,natural=water,name=poly Mw21@outer
    r31 v1 dV Ttype=multipolygon,natural=water,name=multi Mw21@outer,w22@outer
  """

  /** (osm_id, raw EWKB) rows of the multigeom polygons table: tagged
    * closed ways as polygons, multipolygon relations assembled. */
  private def areaRows(osm: OsmXml.OsmDataFrames): DataFrame = {
    val polyUdf = udf((lons: Seq[Double], lats: Seq[Double]) =>
      graft.geom.FromOsm.createPolygon(
        lons.zip(lats).map { case (x, y) => graft.geom.Pt(x, y) }) match {
        case _: graft.geom.NullGeom => null
        case g                      => graft.geom.Ewkb.encode(g)
      })
    val mpUdf = udf((lons: Seq[Seq[Double]], lats: Seq[Seq[Double]]) =>
      graft.geom.FromOsm.createMultiPolygon(
        lons.zip(lats).map { case (lo, la) =>
          lo.zip(la).map { case (x, y) => graft.geom.Pt(x, y) }
        }) match {
        case _: graft.geom.NullGeom => null
        case g                      => graft.geom.Ewkb.encode(g)
      })
    val resolved = Middle.resolveAllWayCoords(osm)
    val wayRows = osm.ways.where(size($"tags") > 0)
      .join(resolved, $"id" === $"rwid")
      .select($"id".as("osm_id"), polyUdf($"wlons", $"wlats").as("geom"))
    val relRows = osm.relations
      .where($"tags".getItem("type") === "multipolygon")
      .select($"id".as("rid"), posexplode($"members").as(Seq("mpos", "m")))
      .where($"m.mtype" === "w")
      .join(resolved, col("m.ref") === $"rwid")
      .groupBy($"rid")
      .agg(
        transform(array_sort(collect_list(struct($"mpos", $"wlons"))),
          s => s.getField("wlons")).as("mlons"),
        transform(array_sort(collect_list(struct($"mpos", $"wlats"))),
          s => s.getField("wlats")).as("mlats"))
      .select((-$"rid").as("osm_id"), mpUdf($"mlons", $"mlats").as("geom"))
    wayRows.unionByName(relRows).where($"geom".isNotNull)
  }

  // the geometries() iterator: split_multi, explode()d per row
  private val splitUdf = udf((b: Array[Byte]) =>
    graft.geom.GeomOps.splitMulti(graft.geom.Ewkb.decode(b))
      .map(g => graft.geom.Ewkb.encode(g)))

  private def typesOf(df: DataFrame, geomCol: org.apache.spark.sql.Column)
      : Seq[(Long, String)] =
    df.select($"osm_id", stGeometryTypeN(geomCol).as("t"))
      .as[(Long, String)].collect().toSeq.sorted

  test("multigeom: 'geometry' column keeps single vs multi as given") {
    val rows = areaRows(OsmText.toFrames(spark, mgBase))
    val got = typesOf(rows,
      Coerce.toGeometryColumn($"geom", FlexType.Geometry))
    assert(got == Seq(
      (-31L, "MULTIPOLYGON"), // two outers stay one multipolygon
      (-30L, "POLYGON"),      // single-poly relation NOT forced multi
      (20L, "POLYGON")))
  }

  test("multigeom: geometries() iterator splits multipolygons into rows") {
    val rows = areaRows(OsmText.toFrames(spark, mgBase))
    // for sgeom in object:as_multipolygon():geometries() do insert(...)
    val split = rows.select($"osm_id",
      explode(splitUdf($"geom")).as("geom"))
    val got = typesOf(split,
      Coerce.toGeometryColumn($"geom", FlexType.Polygon))
    assert(got == Seq((-31L, "POLYGON"), (-31L, "POLYGON"),
      (-30L, "POLYGON"), (20L, "POLYGON")))
  }

  test("multigeom: 'multipolygon' column wraps single polygons") {
    val rows = areaRows(OsmText.toFrames(spark, mgBase))
    val got = typesOf(rows,
      Coerce.toGeometryColumn($"geom", FlexType.Multipolygon))
    assert(got == Seq((-31L, "MULTIPOLYGON"), (-30L, "MULTIPOLYGON"),
      (20L, "MULTIPOLYGON")))

    // splitting + multipolygon column: every row is a wrapped single
    val split = rows.select($"osm_id",
      explode(splitUdf($"geom")).as("geom"))
    val got2 = typesOf(split,
      Coerce.toGeometryColumn($"geom", FlexType.Multipolygon))
    assert(got2 == Seq((-31L, "MULTIPOLYGON"), (-31L, "MULTIPOLYGON"),
      (-30L, "MULTIPOLYGON"), (20L, "MULTIPOLYGON")))
  }

  test("geometry columns reproject to their declared projection") {
    val rows = areaRows(OsmText.toFrames(spark, mgBase)) // 4326 input
    def sridsOf(c: org.apache.spark.sql.Column): Set[Int] =
      rows.select(c.as("g")).as[Array[Byte]].collect()
        .map(b => graft.geom.Ewkb.decode(b).srid).toSet
    // multipolygon column defaults to 3857 → transformed on write
    assert(sridsOf(Coerce.toGeometryColumn($"geom",
      FlexType.Multipolygon)) == Set(graft.geom.Srid.WebMercator))
    // explicit projection = 4326 → left alone
    assert(sridsOf(Coerce.toGeometryColumn($"geom",
      FlexType.Multipolygon, graft.geom.Srid.WGS84)) ==
      Set(graft.geom.Srid.WGS84))
    // beyond the reference's no-PROJ pair: projection = 25832
    // (ETRS89/UTM32) reprojects through the TM pack — SRID tagged and
    // coordinates in meters (the test geometry lives near lon/lat 0/0,
    // far west of zone 32, so easting is large-negative of the 500 km
    // false easting)
    val utm = rows.select(Coerce.toGeometryColumn($"geom",
      FlexType.Multipolygon, 25832).as("g")).as[Array[Byte]].collect()
      .map(graft.geom.Ewkb.decode)
    assert(utm.map(_.srid).toSet == Set(25832))
    val env = graft.geom.Box.of(utm.head).get
    assert(env.minX < -400000 && math.abs(env.maxY) < 1.3e6)
  }

  test("copyRowParse is the inverse of copyRow") {
    import graft.sinks.PgSink
    val vals = Seq(Some("a\tb\nc"), None, Some(""), Some("x\\y"))
    assert(PgSink.copyRowParse(PgSink.copyRow(vals)) == vals)
  }

  test("geometry-iteration.feature: geometries()/geometry_n/num over routes") {
    import graft.geom._
    val l20 = Seq(Pt(0, 2), Pt(1, 2), Pt(2, 1))
    val l21 = Seq(Pt(0, 1), Pt(1, 0), Pt(2, 0))
    // r30 = two member lines, r31 = one, r33 = node member only
    val r30 = FromOsm.createMultiLineString(Seq(l20, l21))
    val r31 = FromOsm.createMultiLineString(Seq(l20))
    val r33 = FromOsm.createMultiLineString(Seq.empty)

    assert(r30.numGeometries == 2)
    assert(r31.numGeometries == 1)
    assert(r33.isInstanceOf[NullGeom]) // no rows for r33

    // geometries(): each sub-line is a plain linestring (num = 1)
    val parts30 = GeomOps.splitMulti(r30)
    assert(parts30.map(_.numGeometries) == Vector(1, 1))
    assert(parts30.head == LineString(l20.toVector, Srid.WGS84))
    assert(GeomOps.splitMulti(r31).head ==
      LineString(l20.toVector, Srid.WGS84))

    // geometry_n(1): the first member line
    assert(GeomOps.geometryN(r30, 1) == LineString(l20.toVector, Srid.WGS84))
    assert(GeomOps.geometryN(r31, 1) == LineString(l20.toVector, Srid.WGS84))
  }

  test("untagged.feature: normal and untagged callbacks, import + update") {
    val base = """
      n11 v1 dV x1 y1
      n12 v1 dV x2 y2
      n13 v1 dV x3 y3
      n14 v1 dV Tamenity=restaurant x4 y4
      w20 v1 dV Thighway=primary Nn11,n12
      w21 v1 dV Nn13,n14
      w22 v1 dV Nn11,n12
      r30 v1 dV Mn11@,w20@
      r31 v1 dV Ttype=route Mw20@
    """
    // process_node + process_untagged_node → every entity gets a row,
    // tagged = whether the tag list is non-empty
    def tables(osm: OsmXml.OsmDataFrames) = {
      def rows(df: DataFrame) = df
        .select($"id", (size($"tags") > 0).as("tagged"), $"tags")
        .as[(Long, Boolean, Map[String, String])].collect().toSeq
        .sortBy(_._1)
      (rows(osm.nodes), rows(osm.ways), rows(osm.relations))
    }

    val b = OsmText.toFrames(spark, base)
    val (n0, w0, r0) = tables(b)
    assert(n0 == Seq((11L, false, Map()), (12L, false, Map()),
      (13L, false, Map()), (14L, true, Map("amenity" -> "restaurant"))))
    assert(w0 == Seq((20L, true, Map("highway" -> "primary")),
      (21L, false, Map()), (22L, false, Map())))
    assert(r0 == Seq((30L, false, Map()),
      (31L, true, Map("type" -> "route"))))

    val after = ClassicUpdate.applyChanges(b, OsmText.toFrames(spark, """
      n11 v2 dV Tnatural=tree x1 y1
      n14 v2 dV x4 y4
      w21 v2 dV Nn14,n13
    """, change = true))
    val (n1, w1, r1) = tables(after)
    assert(n1 == Seq((11L, true, Map("natural" -> "tree")),
      (12L, false, Map()), (13L, false, Map()), (14L, false, Map())))
    assert(w1 == w0 && r1 == r0)
  }

  test("nogeom.feature: updating a table without geometry") {
    val base = OsmText.toFrames(spark, """
      n10 v1 dV Tamenity=restaurant x10.0 y10.0
      n11 v1 dV Tamenity=post_box x10.0 y10.2
    """)
    def pois(osm: OsmXml.OsmDataFrames) = osm.nodes
      .select($"id", $"tags".getItem("name").as("name"),
        $"tags".getItem("amenity").as("amenity"))
      .as[(Long, Option[String], String)].collect().toSeq.sorted
    assert(pois(base) == Seq((10L, None, "restaurant"),
      (11L, None, "post_box")))

    val after = ClassicUpdate.applyChanges(base, OsmText.toFrames(spark,
      "n10 v2 dV Tamenity=restaurant,name=Schwanen x10.0 y10.0",
      change = true))
    assert(pois(after) == Seq((10L, Some("Schwanen"), "restaurant"),
      (11L, None, "post_box")))
  }
}
