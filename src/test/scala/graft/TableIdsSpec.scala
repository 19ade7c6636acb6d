package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._
import graft.sources.OsmText

/** Ports of tests/bdd/flex/table-ids.feature and the semantic
  * scenarios of lua-table-ids.feature: tables defined without ids are
  * insert-only (append never removes their rows), custom id_column
  * names, and the define-time validation of ids declarations.
  */
class TableIdsSpec extends SparkSpecBase {

  import spark.implicits._

  private object NoIdsConfig extends FlexConfig {
    val simple = FlexTableDef("simple", FlexIds.NoIndex,
      Seq(FlexColumn("id", FlexType.Int8)))
    override def tables = Seq(simple)
    private def ins(df: DataFrame) =
      Map("simple" -> df.select($"id".cast("long").as("id")))
    override def processNodes(nodes: DataFrame) =
      ins(nodes.where(size($"tags") > 0))
    override def processWays(ways: DataFrame) = ins(ways)
    override def processRelations(rels: DataFrame) = ins(rels)
  }

  private def ids(r: FlexRunner.Result): Set[Long] =
    r.tables("simple").rows.select($"id").as[Long].collect().toSet

  test("no-ids table: inserts from every context, append never " +
    "deletes (table-ids.feature)") {
    val base = OsmText.toFrames(spark, """
      n1 v1 dV Tp=1 x10.0 y10.0
      n2 v1 dV Tp=2 x10.2 y10.0
      n3 v1 dV x10.0 y10.1
      n4 v1 dV x10.2 y10.1
      w10 v1 dV Tp=10 Nn1,n2,n4
      r100 v1 dV Tp=100 Mn1@,n2@
    """)
    val imported = ids(FlexRunner.run(NoIdsConfig, base))
    assert(imported == Set(1L, 2L, 10L, 100L))

    // append: n1 deleted, w11 added. A table without ids has nothing
    // to delete-by — prior rows stay put, only the changed entities'
    // callbacks add rows (the feature's golden keeps id=1 even though
    // n1 is gone).
    val diff = OsmText.toFrames(spark, """
      n1 v2 dD
      w11 v1 dV Tp=11 Nn1,n3
    """, change = true)
    val processable = diff.copy(
      nodes = diff.nodes.where($"visible"),
      ways = diff.ways.where($"visible"),
      relations = diff.relations.where($"visible"))
    val appended = imported ++ ids(FlexRunner.run(NoIdsConfig, processable))
    assert(appended == Set(1L, 2L, 10L, 11L, 100L))
  }

  test("no-ids table schema carries no id column; custom id_column " +
    "names are honored (lua-table-ids.feature)") {
    assert(NoIdsConfig.simple.schema.fieldNames.toSeq == Seq("id"))
    assert(!NoIdsConfig.simple.hasIds)
    val custom = FlexTableDef("foo", FlexIds.Node,
      Seq(FlexColumn("bar", FlexType.Text)), idColumn = "abc")
    assert(custom.schema.fieldNames.toSeq == Seq("abc", "bar"))
  }

  test("every ids type is accepted (lua-table-ids.feature outline)") {
    FlexIds.values.foreach { t =>
      FlexTableDef("foo", t, Seq(FlexColumn("bar", FlexType.Text)))
    }
  }

  test("special characters are rejected in identifiers " +
    "(lua-table-ids.feature / src/pgsql.cpp:259-270)") {
    val e = intercept[IllegalArgumentException] {
      FlexTableDef("foo", FlexIds.Node,
        Seq(FlexColumn("bar", FlexType.Text)), idColumn = "a\"b\"c")
    }
    assert(e.getMessage.contains(
      "Special characters are not allowed in column names: 'a\"b\"c'."))
    intercept[IllegalArgumentException] {
      FlexTableDef("fo;o", FlexIds.Node,
        Seq(FlexColumn("bar", FlexType.Text)))
    }
    intercept[IllegalArgumentException] {
      FlexTableDef("foo", FlexIds.Node,
        Seq(FlexColumn("b(ar)", FlexType.Text)))
    }
    // plain names sail through, including underscores and digits
    FlexTableDef("foo_2", FlexIds.Node,
      Seq(FlexColumn("bar_baz9", FlexType.Text)))
  }

  test("a config with no tables is rejected (lua-basics.feature)") {
    val e = intercept[IllegalArgumentException] {
      FlexConfig.validateTables(Nil)
    }
    assert(e.getMessage.contains("No output tables defined"))
  }

  test("id cache is only available for node ids (lua-table-ids.feature)") {
    FlexTableDef("foo", FlexIds.Node,
      Seq(FlexColumn("bar", FlexType.Text)), idCache = true)
    val e = intercept[IllegalArgumentException] {
      FlexTableDef("foo", FlexIds.Way,
        Seq(FlexColumn("bar", FlexType.Text)), idCache = true)
    }
    assert(e.getMessage.contains("ID cache only available for node ids."))
  }
}
