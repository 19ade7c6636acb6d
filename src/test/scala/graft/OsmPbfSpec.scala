package graft

import org.apache.spark.sql.functions._

import graft.sources.OsmPbf

/** PBF decoder against the reference's own regression extract
  * (tests/data/liechtenstein-2013-08-03.osm.pbf): structural and
  * geographic sanity — entity counts, ordering invariant, coordinates
  * inside the Liechtenstein bbox, way-ref resolvability. */
class OsmPbfSpec extends SparkSpecBase {
  import spark.implicits._

  private val path = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"

  test("blob scan finds header + data blobs") {
    val spans = OsmPbf.scanBlobs(path)
    assert(spans.head.blobType == "OSMHeader")
    assert(spans.count(_.blobType == "OSMData") >= 1)
  }

  test("decode: counts, bbox, ordering, ref integrity") {
    val osm = OsmPbf.read(spark, path)
    val nNodes = osm.nodes.count()
    val nWays = osm.ways.count()
    val nRels = osm.relations.count()
    // the 2013 extract holds 65k nodes / 6k ways (decode correctness is
    // pinned exactly by ClassicRegressionSpec's golden counts)
    assert(nNodes == 65733L, s"nodes=$nNodes")
    assert(nWays > 5000, s"ways=$nWays")
    assert(nRels > 100, s"rels=$nRels")

    // Liechtenstein + surroundings bbox
    val coords = osm.nodes.agg(
      min($"lon"), max($"lon"), min($"lat"), max($"lat"))
      .as[(Double, Double, Double, Double)].head()
    assert(coords._1 > 9.0 && coords._2 < 10.0, s"lon range $coords")
    assert(coords._3 > 46.5 && coords._4 < 47.6, s"lat range $coords")

    // global ordering invariant: ids ascending within each stream
    assert(graft.sources.Validate.orderingViolations(
      osm.nodes.select("id")).isEmpty)
    assert(graft.sources.Validate.orderingViolations(
      osm.ways.select("id")).isEmpty)

    // tags decoded: some nodes have names
    assert(osm.nodes.where(map_keys($"tags").isNotNull &&
      array_contains(map_keys($"tags"), "name")).count() > 100)

    // way refs resolve against the node store (middle join works):
    // in a clipped extract some boundary ways reference clipped nodes,
    // but the overwhelming majority must resolve
    val refs = osm.ways.select(explode($"nodes").as("ref"))
    val resolved = refs.join(osm.nodes.select($"id".as("ref")), Seq("ref"),
      "left_semi").count()
    assert(resolved.toDouble / refs.count() > 0.99)
  }
}
