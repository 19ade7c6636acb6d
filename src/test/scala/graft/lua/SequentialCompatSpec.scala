package graft.lua

import org.apache.spark.sql.Row

import graft.SparkSpecBase
import graft.flex._
import graft.sources.OsmText

/** The single-state sequential after_* compatibility pass
  * (LuaFlexConfig.processGraphSequential) must produce EXACTLY the
  * tables the distributed per-partition path produces — the only
  * permitted difference is the side-effect contract (cumulative
  * prints, which only one state can honor). Pinned on a config that
  * exercises everything the sequential loop reimplements: process +
  * untagged callbacks, two-stage marks with stage-2 reprocess, and
  * an after_ callback observing cross-entity state. */
class SequentialCompatSpec extends SparkSpecBase {

  private val src =
    """local pts = osm2pgsql.define_table{
      |  name = 'pts',
      |  ids = { type = 'node', id_column = 'nid' },
      |  columns = {
      |    { column = 'kind', type = 'text' },
      |    { column = 'refs', type = 'text' } }}
      |local lns = osm2pgsql.define_table{
      |  name = 'lns',
      |  ids = { type = 'way', id_column = 'wid' },
      |  columns = {
      |    { column = 'stage', type = 'int4' },
      |    { column = 'rel_ref', type = 'text' } }}
      |local w2r = {}
      |local seen = 0
      |function osm2pgsql.process_node(object)
      |  seen = seen + 1
      |  pts:insert{ kind = object.tags.amenity or 'none' }
      |end
      |function osm2pgsql.process_way(object)
      |  lns:insert{ stage = osm2pgsql.stage,
      |              rel_ref = w2r[object.id] }
      |end
      |function osm2pgsql.select_relation_members(relation)
      |  if relation.tags.type == 'route' then
      |    local ways = {}
      |    for _, m in ipairs(relation.members) do
      |      if m.type == 'w' then ways[#ways + 1] = m.ref end
      |    end
      |    return { ways = ways }
      |  end
      |end
      |function osm2pgsql.process_relation(object)
      |  if object.tags.type == 'route' then
      |    for _, m in ipairs(object.members) do
      |      if m.type == 'w' then w2r[m.ref] = object.tags.ref end
      |    end
      |  end
      |end
      |function osm2pgsql.after_nodes()
      |  print('nodes_seen=' .. seen)
      |end
      |""".stripMargin

  private val data =
    """
    n10 v1 dV Tamenity=cafe x10.0 y10.0
    n11 v1 dV x10.1 y10.0
    n12 v1 dV Tamenity=bar x10.2 y10.0
    n13 v1 dV x10.3 y10.0
    w20 v1 dV Thighway=path Nn10,n11
    w21 v1 dV Thighway=road Nn11,n12
    w22 v1 dV Thighway=lane Nn12,n13
    r30 v1 dV Ttype=route,ref=R7 Mw20@,w22@
    """

  private def tables(seqGate: String): Map[String, Array[Row]] = {
    spark.conf.set("graft.flex.sequentialAfterMax", seqGate)
    try {
      val osm = Enrich.forFlex(OsmText.toFrames(spark, data), "create")
      val r = FlexRunner.run(new LuaFlexConfig(src), osm)
      r.tables.map { case (n, tr) =>
        n -> tr.rows.orderBy(tr.rows.columns.map(
          org.apache.spark.sql.functions.col): _*).collect()
      }
    } finally spark.conf.unset("graft.flex.sequentialAfterMax")
  }

  test("sequential pass produces the distributed pass's exact tables") {
    val seq = tables(seqGate = "1000000") // under gate → sequential
    val dist = tables(seqGate = "0")      // gate 0 → distributed
    assert(seq.keySet == dist.keySet)
    seq.keySet.foreach { t =>
      assert(seq(t).toSeq == dist(t).toSeq,
        s"table $t diverged between sequential and distributed")
    }
    // the two-stage content itself: marked ways (members of r30) got
    // reprocessed in stage 2 with the relation ref; w21 stayed stage 1
    val lns = seq("lns").map(r =>
      (r.getLong(r.fieldIndex("wid")),
        r.getInt(r.fieldIndex("stage")),
        Option(r.getString(r.fieldIndex("rel_ref"))))).toSet
    assert(lns == Set(
      (20L, 2, Some("R7")),
      (21L, 1, None),
      (22L, 2, Some("R7"))))
    // nodes: process_node runs only for TAGGED nodes (2 of 4)
    val kinds = seq("pts").map(r =>
      r.getString(r.fieldIndex("kind"))).sorted.toSeq
    assert(kinds == Seq("bar", "cafe"))
  }
}
