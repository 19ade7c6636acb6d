package graft

import org.apache.spark.sql.functions._

import graft.flex.{Helpers, TwoStage}
import graft.model.{OsmMember, OsmRelation, OsmWay}

class FlexHelpersSpec extends SparkSpecBase {
  import spark.implicits._

  test("helper library: prefix/suffix/clamp/split/check/memberIds") {
    val df = Seq(("addr:city", "10 km", "primary")).toDF("k", "w", "h")
    val row = df.select(
      Helpers.hasPrefix($"k", "addr:").as("p"),
      Helpers.hasSuffix($"k", "city").as("s"),
      Helpers.clamp(lit(15), lit(0), lit(10)).as("c"),
      Helpers.splitUnit($"w", "m").as("u"),
      Helpers.checkValues(Seq("primary", "secondary"))($"h").as("ok"),
      Helpers.checkValues(Seq("secondary"), Some("other"))($"h").as("dflt"),
      Helpers.splitString(lit("a; b ;c")).as("parts"))
      .collect().head
    assert(row.getBoolean(0) && row.getBoolean(1))
    assert(row.getInt(2) == 10)
    val u = row.getStruct(3)
    assert(u.getDouble(0) == 10.0 && u.getString(1) == "km")
    assert(row.getString(4) == "primary")
    assert(row.getString(5) == "other")
    assert(row.getSeq[String](6) == Seq("a", "b", "c"))

    val rels = Seq(OsmRelation(1, members = Seq(
      OsmMember("n", 5, ""), OsmMember("w", 7, ""), OsmMember("w", 9, ""))))
      .toDF()
    val ids = rels.select(
      Helpers.memberIds($"members", "w", typeField = "mtype").as("w"),
      Helpers.memberIds($"members", "n", typeField = "mtype").as("n"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(ids == ((Seq(7L, 9L), Seq(5L))))
  }

  test("flex line-splitting feature: unsplit + segmentized tables") {
    // port of tests/bdd/flex/line-splitting.feature — a FlexConfig
    // writing one table with the raw linestring and one with its
    // segmentize(1.0) pieces via the geometries() iterator (explode):
    // the 0.5 grid places n10(20,20) n11(21,20) n12(22.5,20)
    import graft.flex.{FlexColumn, FlexIds, FlexTableDef, FlexType}
    import graft.geom.{Ewkb, FromOsm, GeomOps, NullGeom, Pt}
    import graft.operators.Middle
    import graft.sources.OsmText

    val osm = OsmText.toFrames(spark, """
      n10 x20.0 y20.0
      n11 x21.0 y20.0
      n12 x22.5 y20.0
      w20 v1 dV Thighway=primary Nn10,n11
      w21 v1 dV Thighway=primary Nn10,n12
    """)

    val lineTable = FlexTableDef("osm2pgsql_test_line", FlexIds.Way, Seq(
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))
    val splitTable = FlexTableDef("osm2pgsql_test_split", FlexIds.Way, Seq(
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("geom", FlexType.Linestring, notNull = true)))
    assert(lineTable.schema.fieldNames.head == "osm_id")

    val locs = osm.nodes.select($"id".as("nid"), $"lon", $"lat")
    val resolved = Middle.resolveWayNodes(
      osm.ways.select("id", "nodes"), "id", "nodes", locs, "nid",
      Seq("lon", "lat"))
      .select($"id",
        transform($"resolved", r => r.getField("lon")).as("lons"),
        transform($"resolved", r => r.getField("lat")).as("lats"))
    val asLine = udf((lons: Seq[Double], lats: Seq[Double]) =>
      FromOsm.createLineString(lons.zip(lats).map { case (x, y) =>
        Pt(x, y) }) match {
        case _: NullGeom => null
        case g           => Ewkb.encode(g)
      })
    val pieces = udf((b: Array[Byte]) =>
      GeomOps.splitMulti(GeomOps.segmentize(Ewkb.decode(b), 1.0))
        .map(Ewkb.encode(_)))
    val base = osm.ways.join(resolved, "id")
      .select($"id".as("osm_id"), $"tags",
        asLine($"lons", $"lats").as("geom"))

    val lenOf = udf((b: Array[Byte]) => GeomOps.length(Ewkb.decode(b)))
    val lineRows = base.select($"osm_id", lenOf($"geom").as("len"))
      .as[(Long, Double)].collect().toMap
    assert(lineRows == Map(20L -> 1.0, 21L -> 2.5))

    val splitRows = base
      .select($"osm_id", explode(pieces($"geom")).as("geom"))
      .select($"osm_id", lenOf($"geom").as("len"))
      .as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(splitRows(20L) == Seq(1.0))
    assert(splitRows(21L) == Seq(0.5, 1.0, 1.0))
  }

  test("flex bbox feature: object get_bbox incl. the 3857 golden point") {
    // port of tests/bdd/flex/bbox.feature — node bbox degenerates to
    // the coordinate; the 0.1-grid way spans x[20.0,20.1] y[10.1,10.2];
    // the 3857 projection matches the feature's golden coordinates
    import graft.geom.{Box, Ewkb, FromOsm, GeomOps, Srid}
    import graft.sources.OsmText
    import graft.operators.Middle

    val osm = OsmText.toFrames(spark, """
      n10 x20.0 y10.1
      n11 x20.1 y10.1
      n12 x20.1 y10.2
      w20 v1 dV Thighway=primary Nn10,n11,n12
    """)
    val nodeBbox = osm.nodes.where($"id" === 10)
      .select($"lon", $"lat").as[(Double, Double)].head()
    val p = FromOsm.createPoint(nodeBbox._1, nodeBbox._2)
    val b = FromOsm.getBbox(p).get
    assert(b.minX == 20.0 && b.maxX == 20.0 &&
      b.minY == 10.1 && b.maxY == 10.1)
    // golden 3857 projection from the feature table: 2226389.8 1130195.4
    val merc = GeomOps.transform(p, Srid.WebMercator)
    val mb = FromOsm.getBbox(merc).get
    assert(math.abs(mb.minX - 2226389.8) < 0.1)
    assert(math.abs(mb.minY - 1130195.4) < 0.1)

    val locs = osm.nodes.select($"id".as("nid"), $"lon", $"lat")
    val resolved = Middle.resolveWayNodes(
      osm.ways.select("id", "nodes"), "id", "nodes", locs, "nid",
      Seq("lon", "lat"))
      .select($"id",
        transform($"resolved", r => r.getField("lon")).as("lons"),
        transform($"resolved", r => r.getField("lat")).as("lats"))
    val wb = udf((lons: Seq[Double], lats: Seq[Double]) => {
      val g = FromOsm.createLineString(
        lons.zip(lats).map { case (x, y) => graft.geom.Pt(x, y) })
      FromOsm.getBbox(g).map(b => (b.minX, b.minY, b.maxX, b.maxY)).orNull
    })
    val wayB = resolved.where($"id" === 20)
      .select(wb($"lons", $"lats").as("b"))
      .select($"b._1", $"b._2", $"b._3", $"b._4")
      .as[(Double, Double, Double, Double)].head()
    assert(wayB == ((20.0, 10.1, 20.1, 10.2)))
  }

  test("flex geometry-null: invalid geom is NULL / dropped when not_null") {
    // port of tests/bdd/flex/geometry-null.feature's core semantics:
    // a one-node way has no linestring → nullable geometry column gets
    // NULL, a not_null column drops the row (soft error, counted)
    import graft.geom.{Ewkb, FromOsm, NullGeom, Pt}
    import graft.operators.Progress

    val asLine = udf((lons: Seq[Double], lats: Seq[Double]) =>
      FromOsm.createLineString(lons.zip(lats).map { case (x, y) =>
        Pt(x, y) }) match {
        case _: NullGeom => null
        case g           => Ewkb.encode(g)
      })
    val ways = Seq(
      (20L, Seq(1.0, 2.0), Seq(1.0, 1.0)), // valid 2-point line
      (21L, Seq(1.0), Seq(1.0)))           // 1 point → null geometry
      .toDF("osm_id", "lons", "lats")
      .select($"osm_id", asLine($"lons", $"lats").as("geom"))

    val nullable = ways.select($"osm_id", $"geom").collect()
    assert(nullable.length == 2)
    assert(nullable.count(_.isNullAt(1)) == 1)

    val (instr, obs) = Progress.insertCounts(ways, Seq("geom"))
    val notNull = instr.where($"geom".isNotNull)
    assert(notNull.count() == 1 &&
      notNull.select($"osm_id").as[Long].head() == 20L)
    assert(obs.get("n_null_violations") == 1L)
  }

  test("two-stage: marked ways re-processed with relation context") {
    val ways = Seq(
      OsmWay(1, tags = Map("highway" -> "primary")),
      OsmWay(2, tags = Map("highway" -> "residential")),
      OsmWay(3, tags = Map("highway" -> "service"))).toDF()
    val rels = Seq(OsmRelation(10,
      members = Seq(OsmMember("w", 1, ""), OsmMember("w", 3, "")),
      tags = Map("type" -> "route", "route" -> "bus"))).toDF()

    val out = TwoStage.run(ways, rels,
      selectRelationMembers = r => r
        .where($"tags".getItem("type") === "route")
        .select(explode(Helpers.memberIds($"members", "w",
          typeField = "mtype"))),
      processStage1 = w => w.select($"id", lit(1).as("stage"),
        lit(null).cast("string").as("route")),
      processStage2 = w => w.select($"id", lit(2).as("stage"),
        lit("bus").as("route")))

    val m = out.select($"id", $"stage", $"route")
      .as[(Long, Int, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) == ((2, Some("bus"))))
    assert(m(2L) == ((1, None)))
    assert(m(3L) == ((2, Some("bus"))))
  }
}
