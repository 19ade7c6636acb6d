package graft

import java.nio.file.Files

import graft.flex.{FlexColumn, FlexIds, FlexTableDef, FlexType}
import graft.sinks.PgSink

/** End-to-end run of the COPY sink's bulk path against a LIVE
  * PostgreSQL server: DDL lifecycle (UNLOGGED create → COPY FROM STDIN
  * → SET LOGGED + index + ANALYZE), the byte-exact COPY TEXT wire
  * encoding (escapes, hstore, NULLs), and append-mode
  * delete-before-insert — the pieces q51 and OutputsSpec prove against
  * goldens, here proven against the real parser.
  *
  * The cluster is created in a temp dir on a unix socket (no TCP) and
  * torn down after; the suite self-cancels when postgres binaries or
  * root (for `su postgres`) are unavailable, so it degrades to the
  * golden tests elsewhere. The JDBC `write`/`deleteSql` prepared-path
  * is NOT exercised (no pgjdbc driver on the classpath — documented in
  * COVERAGE.md); COPY is the reference's actual bulk path
  * (src/db-copy.cpp) and is what runs here.
  *
  * Geometry columns are omitted: no PostGIS in the sandbox; their
  * hex-EWKB COPY form is byte-golden-tested in OutputsSpec.
  */
class PgLiveSpec extends SparkSpecBase {

  import PgTestCluster.{pg, psql, sockDir}

  /** COPY FROM STDIN with the given wire lines; returns psql rc. */
  private def copyIn(table: String, lines: Seq[String]): Int = {
    val payload = s"COPY $table FROM STDIN;\n" +
      lines.map(_ + "\n").mkString + "\\.\n"
    pg(s"psql -q -h $sockDir -d postgres",
      payload.getBytes("UTF-8"))._1
  }

  private def copyOut(query: String): Seq[String] = {
    val (rc, out) = psql(s"COPY ($query) TO STDOUT;")
    assert(rc == 0, s"COPY TO failed: $out")
    out.split("\n", -1).toSeq.dropRight(1)
  }

  override def withFixture(test: NoArgTest) = {
    if (!PgTestCluster.up) cancel("no runnable PostgreSQL in this environment")
    else super.withFixture(test)
  }

  private val tableDef = FlexTableDef(
    name = "graft_live",
    ids = FlexIds.Way,
    columns = Seq(
      FlexColumn("name", FlexType.Text),
      FlexColumn("tags", FlexType.Hstore),
      FlexColumn("population", FlexType.Int8),
      FlexColumn("ok", FlexType.Boolean)),
    cluster = false)

  // nasty payloads: every escape class the wire format handles
  private val rows: Seq[(Long, Option[String], Seq[(String, String)],
      Option[Long], Option[Boolean])] = Seq(
    (1L, Some("plain"), Seq("highway" -> "primary"), Some(42L), Some(true)),
    (2L, Some("tab\there\nand newline"), Seq("note" -> "line1\nline2"),
      None, Some(false)),
    (3L, Some("""back\slash and "quotes""""),
      Seq("""key"quoted""" -> """v\1""", "k2" -> "a\tb"), Some(-7L), None),
    (4L, None, Seq.empty, Some(0L), Some(true)),
    (5L, Some("ünïcode ✓"), Seq("name:uk" -> "Київ"), Some(9L), Some(false)))

  private def wireLines: Seq[String] = {
    // the production shape: per-partition pure-CPU formatting — run it
    // through Spark executors exactly as a distributed writer would
    val rdd = spark.sparkContext.parallelize(rows, 2)
    rdd.map { case (id, name, tags, pop, ok) =>
      (id, PgSink.copyLine(Seq(
        PgSink.CopyValue(id.toString),
        name.fold[PgSink.CopyCell](PgSink.CopyNull)(PgSink.CopyValue),
        PgSink.CopyPreEscaped(PgSink.hstoreCopyValue(tags)),
        pop.fold[PgSink.CopyCell](PgSink.CopyNull)(p =>
          PgSink.CopyValue(p.toString)),
        ok.fold[PgSink.CopyCell](PgSink.CopyNull)(b =>
          PgSink.CopyValue(if (b) "t" else "f")))))
    }.collect().sortBy(_._1).map(_._2).toSeq
  }

  test("DDL lifecycle + COPY load round-trips every escape class") {
    psql(s"""DROP TABLE IF EXISTS "public"."graft_live";""")
    psql("CREATE EXTENSION IF NOT EXISTS hstore;")
    val (rcDdl, outDdl) =
      psql(PgSink.createTableDdl(tableDef, unlogged = true) + ";")
    assert(rcDdl == 0, s"create failed: $outDdl")
    // UNLOGGED is live until the post-load batch flips it
    assert(copyOut("SELECT relpersistence FROM pg_class " +
      "WHERE relname = 'graft_live'") == Seq("u"))

    assert(copyIn("\"public\".\"graft_live\"", wireLines) == 0)
    assert(copyOut("SELECT count(*) FROM \"public\".\"graft_live\"") ==
      Seq(rows.size.toString))

    // values survive the live parser byte-exactly: read back with
    // COPY TO and our inverse parser, field by field
    val back = copyOut("SELECT \"osm_id\", \"name\", \"population\", " +
      "\"ok\" FROM \"public\".\"graft_live\" ORDER BY \"osm_id\"")
      .map(PgSink.copyRowParse)
    rows.zip(back).foreach { case ((id, name, _, pop, ok), parsed) =>
      assert(parsed(0) == Some(id.toString))
      assert(parsed(1) == name, s"name mismatch for id=$id")
      assert(parsed(2) == pop.map(_.toString))
      assert(parsed(3) == ok.map(b => if (b) "t" else "f"))
    }
    // hstore semantics: every pair is retrievable by key with the
    // exact value (hstore reorders pairs, so compare per key)
    for ((id, _, tags, _, _) <- rows; (k, v) <- tags) {
      // standard_conforming_strings: only quotes double inside '...'
      val kq = k.replace("'", "''")
      val got = copyOut("SELECT \"tags\" -> " +
        s"'$kq'::text " +
        s"FROM \"public\".\"graft_live\" WHERE \"osm_id\" = $id")
        .map(PgSink.copyRowParse(_).head)
      assert(got == Seq(Some(v)), s"hstore[$k] for id=$id")
    }

    // post-load batch: SET LOGGED + default id index + ANALYZE
    PgSink.postLoadDdl(tableDef, updatable = true).foreach { ddl =>
      val (rc, out) = psql(ddl + ";")
      assert(rc == 0, s"post-load '$ddl' failed: $out")
    }
    assert(copyOut("SELECT relpersistence FROM pg_class " +
      "WHERE relname = 'graft_live'") == Seq("p"))
    assert(copyOut("SELECT count(*) FROM pg_indexes " +
      "WHERE tablename = 'graft_live'") == Seq("1"))
  }

  test("schema.feature: tables and indexes land in a named schema") {
    psql("CREATE SCHEMA IF NOT EXISTS osm;")
    psql("""DROP TABLE IF EXISTS "osm"."graft_live";""")
    val (rc, out) =
      psql(PgSink.createTableDdl(tableDef, unlogged = true,
        schema = "osm") + ";")
    assert(rc == 0, s"create in schema failed: $out")
    assert(copyIn("\"osm\".\"graft_live\"", wireLines.take(1)) == 0)
    PgSink.postLoadDdl(tableDef, updatable = true, schema = "osm")
      .foreach { ddl =>
        val (c, o) = psql(ddl + ";")
        assert(c == 0, s"'$ddl' failed: $o")
      }
    assert(copyOut("SELECT schemaname FROM pg_tables " +
      "WHERE tablename = 'graft_live' AND schemaname = 'osm'") ==
      Seq("osm"))
    assert(copyOut("SELECT count(*) FROM pg_indexes " +
      "WHERE tablename = 'graft_live' AND schemaname = 'osm'") ==
      Seq("1"))
  }

  test("writeCopyFiles: executor-formatted COPY files bulk-load cleanly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map_from_entries}
    val df = rows.toDF("osm_id", "name", "tags", "population", "ok")
      .withColumn("tags", map_from_entries(col("tags")))
      .repartition(2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-copyfiles").toString
    try {
      PgSink.writeCopyFiles(df, tableDef, dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(files.length == 2)
      psql("""DROP TABLE IF EXISTS "public"."graft_copyload";""")
      psql(PgSink.createTableDdl(tableDef.copy(name = "graft_copyload"),
        unlogged = true) + ";")
      files.foreach { f =>
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        import scala.jdk.CollectionConverters._
        assert(copyIn("\"public\".\"graft_copyload\"",
          lines.asScala.toSeq) == 0)
      }
      assert(copyOut("SELECT count(*) FROM \"public\".\"graft_copyload\"") ==
        Seq(rows.size.toString))
      // the nastiest row survived the executor-side formatting
      assert(copyOut("SELECT \"tags\" -> 'k2' FROM " +
        "\"public\".\"graft_copyload\" WHERE \"osm_id\" = 3")
        .map(PgSink.copyRowParse(_).head) == Seq(Some("a\tb")))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("PgWire: pure-JVM protocol-v3 exec/query/COPY against the live server") {
    import graft.sinks.PgWire
    val dsn = PgTestCluster.dsn
    assert(PgWire.reachable(dsn), "wire client cannot reach the cluster")
    val c = PgWire.connect(dsn)
    try {
      assert(c.parameters.get("server_encoding").contains("UTF8"))
      c.exec("CREATE EXTENSION IF NOT EXISTS hstore;")
      c.exec("""DROP TABLE IF EXISTS "public"."graft_wire";""")
      c.exec(PgSink.createTableDdl(tableDef.copy(name = "graft_wire"),
        unlogged = true))
      // COPY FROM STDIN over raw CopyData frames — every escape class
      val n = c.copyIn("COPY \"public\".\"graft_wire\" FROM STDIN",
        wireLines.iterator)
      assert(n == rows.size, s"server acknowledged $n rows")
      // the wire query cycle reads the nasty values back verbatim
      val back = c.query("SELECT \"name\" FROM \"public\".\"graft_wire\" " +
        "ORDER BY \"osm_id\"")
      assert(back.map(_.head) == rows.map(_._2))
      for ((id, _, tags, _, _) <- rows; (k, v) <- tags) {
        val kq = k.replace("'", "''")
        val got = c.query("SELECT \"tags\" -> " + s"'$kq'::text " +
          s"FROM \"public\".\"graft_wire\" WHERE \"osm_id\" = $id")
        assert(got == Seq(Seq(Some(v))), s"hstore[$k] for id=$id")
      }
      // errors carry the server's message and leave the connection usable
      val ex = intercept[java.io.IOException](c.exec("SELECT nope();"))
      assert(ex.getMessage.contains("nope"))
      assert(c.query("SELECT 41 + 1") == Seq(Seq(Some("42"))))
      // a refused COPY (missing table) is loud, then usable again
      val ex2 = intercept[java.io.IOException](c.copyIn(
        "COPY \"public\".\"graft_wire_missing\" FROM STDIN", Iterator("x")))
      assert(ex2.getMessage.contains("graft_wire_missing"))
      assert(c.query("SELECT 1") == Seq(Seq(Some("1"))))
    } finally c.close()
  }

  test("PgSink.writeCopy: per-partition wire COPY, identical to an INSERT load") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map_from_entries}
    import graft.sinks.PgWire
    val df = rows.toDF("osm_id", "name", "tags", "population", "ok")
      .withColumn("tags", map_from_entries(col("tags")))
      .repartition(2) // two partitions = two concurrent COPY writers
    val c = PgWire.connect(PgTestCluster.dsn)
    try {
      c.exec("CREATE EXTENSION IF NOT EXISTS hstore;")
      for (t <- Seq("graft_wirecopy", "graft_insert")) {
        c.exec(s"""DROP TABLE IF EXISTS "public"."$t";""")
        c.exec(PgSink.createTableDdl(tableDef.copy(name = t),
          unlogged = true))
      }
      val n = PgSink.writeCopy(df, tableDef.copy(name = "graft_wirecopy"),
        PgTestCluster.dsn)
      assert(n == rows.size, s"writeCopy acknowledged $n rows")
      // the same rows through a multi-row INSERT (SQL literals), then
      // byte-identical COPY TO dumps of both tables
      def lit(s: String) = "'" + s.replace("'", "''") + "'"
      val values = rows.map { case (id, name, tags, pop, ok) =>
        val hs =
          if (tags.isEmpty) "''::hstore"
          else s"hstore(ARRAY[${tags.map(t => lit(t._1)).mkString(",")}]," +
            s" ARRAY[${tags.map(t => lit(t._2)).mkString(",")}])"
        s"($id, ${name.map(lit).getOrElse("NULL")}, $hs, " +
          s"${pop.map(_.toString).getOrElse("NULL")}, " +
          s"${ok.map(_.toString).getOrElse("NULL")})"
      }.mkString(", ")
      c.exec("INSERT INTO \"public\".\"graft_insert\" " +
        s"""("osm_id", "name", "tags", "population", "ok") VALUES $values""")
      def dump(t: String) = copyOut("SELECT \"osm_id\", \"name\", " +
        "\"tags\", \"population\", \"ok\" FROM \"public\".\"" + t +
        "\" ORDER BY \"osm_id\"")
      assert(dump("graft_wirecopy") == dump("graft_insert"),
        "COPY-wire and INSERT loads diverged")
    } finally c.close()
  }

  test("PgSink.writeCopyBinary: COPY BINARY load reads back identical to TEXT") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map_from_entries}
    import graft.sinks.PgWire
    // a wider type matrix than the TEXT test: every binary encoder
    // (int2/int8/float4/float8/bool/text/hstore/jsonb/timestamptz)
    val binDef = FlexTableDef(
      name = "graft_bin",
      ids = FlexIds.Way,
      columns = Seq(
        FlexColumn("name", FlexType.Text),
        FlexColumn("tags", FlexType.Hstore),
        FlexColumn("population", FlexType.Int8),
        FlexColumn("lanes", FlexType.Int2),
        FlexColumn("width", FlexType.Real),
        FlexColumn("area", FlexType.DoublePrecision),
        FlexColumn("ok", FlexType.Boolean),
        FlexColumn("props", FlexType.Json),
        FlexColumn("seen", FlexType.Timestamp)),
      cluster = false)
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val binRows = Seq(
      (1L, Some("plain"), Seq("k" -> "v"), Some(42L), Some(3.toShort),
        Some(2.5f), Some(1.25e10), Some(true), Some("""{"a":1}"""),
        Some(ts(0L))),
      (2L, Some("tab\there\nand \\slash"), Seq("a\tb" -> "c\nd"),
        None, None, None, None, Some(false), None,
        Some(ts(1723800000123L))),
      (3L, None, Seq.empty[(String, String)], Some(-7L), Some(-2.toShort),
        Some(-0.5f), Some(-1.5e-3), None, Some("""{"u":"ü"}"""),
        None),
      (4L, Some("ünïcode ✓"), Seq("name:uk" -> "Київ"), Some(0L),
        Some(0.toShort), Some(0f), Some(0.0), Some(true),
        Some("[1,2,3]"), Some(ts(-1234567L))))
    val df = binRows.toDF("osm_id", "name", "tags", "population",
        "lanes", "width", "area", "ok", "props", "seen")
      .withColumn("tags", map_from_entries(col("tags")))
      .repartition(2)
    val c = PgWire.connect(PgTestCluster.dsn)
    try {
      c.exec("CREATE EXTENSION IF NOT EXISTS hstore;")
      for (t <- Seq("graft_bin_text", "graft_bin_bin")) {
        c.exec(s"""DROP TABLE IF EXISTS "public"."$t";""")
        c.exec(PgSink.createTableDdl(binDef.copy(name = t),
          unlogged = true))
      }
      val nT = PgSink.writeCopy(df, binDef.copy(name = "graft_bin_text"),
        PgTestCluster.dsn)
      val nB = PgSink.writeCopyBinary(df,
        binDef.copy(name = "graft_bin_bin"), PgTestCluster.dsn)
      assert(nT == binRows.size && nB == binRows.size,
        s"acknowledged $nT text / $nB binary rows")
      def dump(t: String) = copyOut(
        "SELECT * FROM \"public\".\"" + t + "\" ORDER BY \"osm_id\"")
      val (dt, db) = (dump("graft_bin_text"), dump("graft_bin_bin"))
      assert(dt == db, s"TEXT and BINARY loads diverged:\n$dt\nvs\n$db")
      // sql_type overrides are refused loudly (wire type unknowable)
      val over = binDef.copy(columns = binDef.columns :+
        FlexColumn("ser", FlexType.Text, sqlTypeOverride = Some("serial")))
      val ex = intercept[IllegalArgumentException](
        PgSink.binaryCopyRows(
          df.withColumn("ser", col("name")), over))
      assert(ex.getMessage.contains("sql_type"))
    } finally c.close()
  }

  test("PgWire: SCRAM-SHA-256 and md5 authentication against the live server") {
    import graft.sinks.PgWire
    // password-protected roles, each pinned to its auth method by a
    // first-match pg_hba rule (trust stays in place for everyone else)
    psql("DROP ROLE IF EXISTS graft_scram;")
    psql("CREATE ROLE graft_scram LOGIN PASSWORD 'wire-secret';")
    psql("DROP ROLE IF EXISTS graft_md5;")
    psql("SET password_encryption = 'md5'; " +
      "CREATE ROLE graft_md5 LOGIN PASSWORD 'md5-secret';")
    val hba = s"${PgTestCluster.dataDir}/pg_hba.conf"
    pg(s"grep -q graft_scram $hba || " +
      s"sed -i '1i local all graft_scram scram-sha-256' $hba")
    pg(s"grep -q graft_md5 $hba || sed -i '1i local all graft_md5 md5' $hba")
    pg(s"pg_ctl -D ${PgTestCluster.dataDir} reload")
    def dsn(user: String, pw: String) =
      s"host=${PgTestCluster.sockDir} dbname=postgres user=$user password=$pw"
    // wrong password is refused with the server's message
    val ex = intercept[java.io.IOException](
      PgWire.connect(dsn("graft_scram", "wrong")))
    assert(ex.getMessage.toLowerCase.contains("password"))
    // RFC 7677 SCRAM-SHA-256 exchange end to end (incl. server
    // signature verification in the client)
    val cs = PgWire.connect(dsn("graft_scram", "wire-secret"))
    try assert(cs.query("SELECT current_user") ==
      Seq(Seq(Some("graft_scram"))))
    finally cs.close()
    // the md5(md5(password + user) + salt) branch
    val cm = PgWire.connect(dsn("graft_md5", "md5-secret"))
    try assert(cm.query("SELECT current_user") ==
      Seq(Seq(Some("graft_md5"))))
    finally cm.close()
  }

  test("append mode: delete-before-insert replaces changed ids only") {
    // the JDBC deleteSql text with its ANY(?) placeholder bound to a
    // pg array literal — semantics identical to the prepared path
    val del = PgSink.deleteSql(tableDef).replace("?", "'{2,5}'")
    val (rcDel, outDel) = psql(del + ";")
    assert(rcDel == 0, s"delete failed: $outDel")
    val replacement = PgSink.copyLine(Seq(PgSink.CopyValue("2"),
      PgSink.CopyValue("renamed"),
      PgSink.CopyPreEscaped(PgSink.hstoreCopyValue(Seq("v" -> "2"))),
      PgSink.CopyValue("1"), PgSink.CopyValue("t")))
    assert(copyIn("\"public\".\"graft_live\"", Seq(replacement)) == 0)
    assert(copyOut("SELECT \"osm_id\" FROM \"public\".\"graft_live\" " +
      "ORDER BY \"osm_id\"") == Seq("1", "2", "3", "4"))
    assert(copyOut("SELECT \"name\" FROM \"public\".\"graft_live\" " +
      "WHERE \"osm_id\" = 2").map(PgSink.copyRowParse(_).head) ==
      Seq(Some("renamed")))
  }
}
