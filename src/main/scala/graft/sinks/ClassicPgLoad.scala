package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.classic.ClassicUpdate

/** End-to-end live PostgreSQL load of the classic four tables — the
  * piece `osm2pgsql -d gis file.pbf` runs after processing
  * (src/osm2pgsql.cpp:47-83 → output-pgsql start/stop + db-copy):
  *
  *  - create: DROP → CREATE UNLOGGED → COPY FROM STDIN → SET LOGGED +
  *    indexes + ANALYZE per table (table_t::start/stop,
  *    src/table.cpp:64-232);
  *  - append: per table, ONE transactional psql session that COPYs
  *    the pending id set into a temp table, deletes matching rows
  *    (db_deleter_by_id_t, src/db-copy.hpp:76-99 — set-at-a-time via
  *    the temp-table join instead of batched ANY lists), then COPYs
  *    the re-derived rows in; ANALYZE after commit.
  *
  * All row formatting happens in executors ([[PgClassic.copyLines]]);
  * the driver only streams formatted lines (toLocalIterator — bounded
  * by one partition). Geometry degrades to bytea when the server has
  * no PostGIS ([[PgClassic.createDdl]]).
  */
object ClassicPgLoad {

  /** Server-side prerequisites: hstore when tag maps are landed (the
    * reference errors without it), PostGIS when available. Returns
    * postgis presence. */
  def prepareServer(dsn: String, hstore: Boolean): Boolean = {
    if (hstore && !PgLive.tryExtension(dsn, "hstore"))
      throw new IllegalStateException(
        "hstore output requested but the hstore extension is not " +
          "available on the target server")
    PgLive.tryExtension(dsn, "postgis")
  }

  private def qualified(t: PgClassic.ClassicTable, schema: String) =
    s""""$schema"."${t.name}""""

  /** Create-mode load of one table from its engine frame. */
  def createLoad(t: PgClassic.ClassicTable, df: DataFrame, dsn: String,
      schema: String, hstoreAll: Boolean, slim: Boolean,
      postgis: Boolean, hstoreIndex: Boolean = false,
      tablespace: Option[String] = None,
      tablespaceIndex: Option[String] = None): Unit = {
    PgLive.execOrThrow(dsn, PgClassic.dropDdl(t, schema) + ";")
    PgLive.execOrThrow(dsn,
      PgClassic.createDdl(t, schema, postgis, tablespace) + ";")
    val lines = PgClassic.copyLines(
      PgClassic.copyFrame(df, t, hstoreAll, postgis), t, postgis)
    // bulk path: N concurrent per-partition COPY writers over the
    // pure-JVM wire client (staged + published atomically, see
    // PgWire.copyPartitioned) when the DSN is wire-connectable FROM
    // AN EXECUTOR — probing on the driver would prove nothing on a
    // multi-node cluster; psql keeps the exotic libpq forms (service
    // files, SSL parameter combinations) working as the fallback
    if (PgWire.reachableFromExecutors(lines.sparkSession, dsn))
      PgWire.copyPartitioned(lines, dsn, qualified(t, schema))
    else
      PgLive.copyInto(dsn, qualified(t, schema),
        lines.toLocalIterator().asScala)
    PgClassic.postLoadDdl(t, slim, schema, postgis, hstoreIndex,
      tablespaceIndex)
      .foreach(d => PgLive.execOrThrow(dsn, d + ";"))
  }

  /** Append-mode delete-then-insert for one table, in one
    * transactional psql session. `ids` is the pending id frame for
    * this table (already negated for relations); `rows` the
    * re-derived engine rows to insert. */
  def appendLoad(t: PgClassic.ClassicTable, ids: DataFrame,
      rows: DataFrame, dsn: String, schema: String, hstoreAll: Boolean,
      postgis: Boolean): Unit = {
    val q = qualified(t, schema)
    val idLines = ids.select(col(ids.columns.head).cast("long"))
      .toLocalIterator().asScala.map(_.getLong(0).toString + "\n")
    val rowLines = PgClassic.copyLines(
      PgClassic.copyFrame(rows, t, hstoreAll, postgis), t, postgis)
      .toLocalIterator().asScala.map(_ + "\n")
    PgLive.session(dsn,
      Iterator("BEGIN;\n",
        "CREATE TEMP TABLE __graft_del (id int8) ON COMMIT DROP;\n",
        "COPY __graft_del FROM STDIN;\n") ++
        idLines ++
        Iterator("\\.\n",
          s"""DELETE FROM $q WHERE "osm_id" IN""" +
            " (SELECT id FROM __graft_del);\n",
          s"COPY $q FROM STDIN;\n") ++
        rowLines ++
        Iterator("\\.\n", "COMMIT;\n", s"ANALYZE $q;\n"))
  }

  /** Full append: the point table keys on changed nodes; the three
    * way tables key on pending ways ∪ negated pending relations
    * (src/osmdata.cpp:371-406). */
  def append(tables: Seq[PgClassic.ClassicTable], d: ClassicUpdate.Delta,
      dsn: String, schema: String, hstoreAll: Boolean,
      postgis: Boolean): Unit = {
    val wayIds = d.pendingWays.select(col("id"))
      .unionByName(d.pendingRels.select((-col("id")).as("id")))
    tables.foreach { t =>
      val (ids, rows) = t.kind match {
        case "point"   => (d.changedNodes, d.rederived.point)
        case "line"    => (wayIds, d.rederived.line)
        case "polygon" => (wayIds, d.rederived.polygon)
        case _         => (wayIds, d.rederived.roads)
      }
      appendLoad(t, ids, rows, dsn, schema, hstoreAll, postgis)
    }
  }
}
