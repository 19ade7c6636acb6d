package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.flex.{FlexColumn, FlexTableDef, FlexType}

/** PostgreSQL sink (reference: src/db-copy.cpp COPY pipeline +
  * src/flex-table.cpp / src/table.cpp table lifecycle).
  *
  * Design, mirrored from the reference but per-partition instead of
  * per-process:
  *  - DDL: CREATE (UNLOGGED for interim tables, src/flex-table.hpp:62),
  *    load, then indexes + ANALYZE at the end (late indexing,
  *    src/flex-table.hpp:189-208) — index-after-load is the same
  *    bulk-load trick at any scale;
  *  - load path: one writer per partition streaming COPY FROM STDIN
  *    over the pure-JVM wire client ([[PgWire]], [[writeCopy]]) — the
  *    reference's actual bulk protocol (src/db-copy.cpp) with no
  *    driver funnel; a generic-JDBC multi-row INSERT path ([[write]])
  *    remains for non-PostgreSQL targets;
  *  - append deletes: batched `DELETE ... WHERE id = ANY(?)` before
  *    insert (db_deleter_by_id_t, src/db-copy.hpp:76-99).
  *
  * DDL generation is pure and unit-tested; live-connection paths need a
  * reachable PG and are exercised only when a JDBC URL is supplied.
  */
object PgSink {

  def sqlType(c: FlexColumn): String =
    c.sqlTypeOverride.getOrElse(sqlTypeOf(c))

  private def sqlTypeOf(c: FlexColumn): String = c.ctype match {
    case FlexType.Text            => "text"
    case FlexType.Boolean         => "boolean"
    case FlexType.Int2            => "int2"
    case FlexType.Int4            => "int4"
    case FlexType.Int8            => "int8"
    case FlexType.Real            => "real"
    case FlexType.DoublePrecision => "double precision"
    case FlexType.Timestamp       => "timestamptz"
    case FlexType.Hstore          => "hstore"
    case FlexType.Json            => "jsonb"
    case FlexType.Direction       => "int2"
    case FlexType.IdType          => "char(1)"
    case FlexType.IdNum           => "int8"
    case FlexType.Geometry        => "geometry"
    case FlexType.Point           => "geometry(point)"
    case FlexType.Linestring      => "geometry(linestring)"
    case FlexType.Polygon         => "geometry(polygon)"
    case FlexType.Multipoint      => "geometry(multipoint)"
    case FlexType.Multilinestring => "geometry(multilinestring)"
    case FlexType.Multipolygon    => "geometry(multipolygon)"
    case FlexType.Geometrycollection => "geometry(geometrycollection)"
  }

  /** CREATE TABLE — UNLOGGED during load for non-updatable imports,
    * like the reference's interim tables (src/flex-table.hpp:58-66).
    * `postgis=false` degrades geometry columns to bytea for servers
    * without PostGIS (the stored value is then the raw EWKB bytes —
    * same payload, no geometry operators). */
  def createTableDdl(t: FlexTableDef, unlogged: Boolean = true,
      schema: String = "public", postgis: Boolean = true): String = {
    // NoIndex tables carry no id column at all (table-ids.feature);
    // otherwise the user's ids.id_column name is used verbatim
    val idCols = t.idFields.map { case (n, dt) =>
      val sql = dt match {
        case org.apache.spark.sql.types.IntegerType => "int4"
        case org.apache.spark.sql.types.StringType  => "char(1)" // type col
        case _                                      => "int8"
      }
      s""""$n" $sql"""
    }
    def colType(c: FlexColumn): String = {
      val ty = sqlType(c)
      if (!postgis && ty.startsWith("geometry")) "bytea" else ty
    }
    val cols = (idCols ++ t.columns.map { c =>
      s""""${c.name}" ${colType(c)}${if (c.notNull) " NOT NULL" else ""}"""
    }).mkString(", ")
    val ul = if (unlogged) "UNLOGGED " else ""
    s"""CREATE ${ul}TABLE IF NOT EXISTS "$schema"."${t.name}" ($cols)"""
  }

  /** End-of-load DDL batch: user/default indexes, then the id index,
    * SET LOGGED, ANALYZE (table_connection_t::create_indexes,
    * src/flex-table.cpp:362-381). */
  def postLoadDdl(t: FlexTableDef, updatable: Boolean,
      schema: String = "public", postgis: Boolean = true): Seq[String] = {
    val qualified = s""""$schema"."${t.name}""""
    // user index list wins over the DEFAULT GEOMETRY index only:
    // None = default, Some(Nil) = none, Some(list) = exactly those
    // (lua-index-definitions.feature); the id index is decided
    // independently below
    val userIdx = t.indexes.map(_.map(_.createIndexDdl(qualified)))
    // default when 'indexes' is absent: ONE gist index on THE (first)
    // geometry column, fillfactor 100 when the table won't be updated
    // (setup_flex_table_indexes, src/flex-lua-table.cpp:403-417); no
    // GiST on the bytea degradation (no PostGIS → no gist opclass)
    val defaultIdx = if (!postgis) Nil else t.columns
      .find(c => FlexType.sparkType(c.ctype) == BinaryType).toSeq
      .map { c =>
        val ff = if (updatable) "" else " WITH (fillfactor = 100)"
        s"""CREATE INDEX ON $qualified USING gist ("${c.name}")$ff"""
      }
    // (always_build_id_index || updateable) && has_id_column —
    // regardless of the user index list (src/flex-table.cpp:375-377);
    // ids.create_index: always → plain, unique → UNIQUE, primary_key →
    // ADD PRIMARY KEY (parse_create_index src/flex-lua-table.cpp:108-125
    // + build_sql_create_id_index src/flex-table.cpp:225-240)
    val ids = t.idFields.map(f => s""""${f._1}"""").mkString(", ")
    val idIdx = if ((t.createIndex != "auto" || updatable) && t.hasIds)
      Seq(t.createIndex match {
        case "primary_key" =>
          s"""ALTER TABLE $qualified ADD PRIMARY KEY ($ids)"""
        case "unique" =>
          s"""CREATE UNIQUE INDEX ON $qualified USING BTREE ($ids)"""
        case _ =>
          s"""CREATE INDEX ON $qualified USING BTREE ($ids)"""
      }) else Nil
    Seq(s"""ALTER TABLE $qualified SET LOGGED""") ++
      userIdx.getOrElse(defaultIdx) ++ idIdx :+ s"""ANALYZE $qualified"""
  }

  /** Batched delete-before-insert for append mode
    * (db_deleter_by_id_t, src/db-copy.hpp:76-99). */
  def deleteSql(t: FlexTableDef, schema: String = "public"): String = {
    // a table without ids has nothing to delete by: append never
    // removes its rows (table-ids.feature)
    require(t.hasIds, s"Table '${t.name}' has no ids; it is insert-only.")
    require(t.ids != graft.flex.FlexIds.Tile,
      s"Table '${t.name}' has tile ids; delete-by-object-id does not apply.")
    s"""DELETE FROM "$schema"."${t.name}" WHERE "${t.idColumn}" = ANY (?)"""
  }

  def insertSql(t: FlexTableDef, schema: String = "public"): String = {
    val cols = t.idFields.map(f => s""""${f._1}"""") ++
      t.writeColumns.map(c => s""""${c.name}"""")
    val params = cols.map(_ => "?")
    s"""INSERT INTO "$schema"."${t.name}" (${cols.mkString(", ")})
       |VALUES (${params.mkString(", ")})""".stripMargin
  }

  // ---- COPY TEXT wire format (src/db-copy-mgr.hpp) ----
  //
  // The reference's actual write path is `COPY ... FROM STDIN` text
  // format, built row-by-row in db_cmd_copy_t buffers. At cluster
  // scale the same shape is: each partition formats its rows into COPY
  // lines (pure CPU, distributed), and per-partition writers stream
  // them into PG — so the encoding must be byte-exact here.

  /** Escaping for a plain text column (add_value,
    * src/db-copy-mgr.hpp:288-314): tab/newline/CR become \t \n \r,
    * backslash and double-quote get a backslash, all other bytes —
    * including control characters — pass through raw (tags.feature's
    * special-character goldens rely on this). */
  def copyEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c    => b.append(c)
    }
    b.toString
  }

  /** The doubly-escaped form used inside hstore literals
    * (add_escaped_string, src/db-copy-mgr.hpp:315-339): the hstore
    * parser unescapes once more, so quote and backslash take two
    * levels while the whitespace escapes stay single. */
  def copyEscapeHstore(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\\\"")
      case '\\' => b.append("\\\\\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c    => b.append(c)
    }
    b.toString
  }

  /** One hstore column value: `"k"=>"v",...` pairs
    * (add_hash_elem + finish_hash, src/db-copy-mgr.hpp:162-231; the
    * final separator comma is dropped rather than written). Pair order
    * is the caller's — the reference writes tags in input order. */
  def hstoreCopyValue(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) =>
      "\"" + copyEscapeHstore(k) + "\"=>\"" + copyEscapeHstore(v) + "\""
    }.mkString(",")

  /** Geometry column: hex-encoded EWKB (add_hex_geom,
    * src/db-copy-mgr.hpp:237-254). */
  def hexGeomCopyValue(ewkb: Array[Byte]): String =
    ewkb.map(b => f"$b%02X").mkString

  /** One cell of a COPY TEXT line. [[CopyValue]] is escaped by
    * [[copyLine]]; [[CopyPreEscaped]] carries a value already in wire
    * form — [[hstoreCopyValue]] and [[hexGeomCopyValue]] produce the
    * COMBINED (column + COPY layer) escaping, exactly like the
    * reference's add_hash_elem/add_hex_geom append directly into the
    * COPY buffer (src/db-copy-mgr.hpp:162-254), so escaping them again
    * would corrupt the line (live-PG proven in PgLiveSpec). */
  sealed trait CopyCell
  case object CopyNull extends CopyCell
  final case class CopyValue(s: String) extends CopyCell
  final case class CopyPreEscaped(s: String) extends CopyCell

  /** A full COPY TEXT line from typed cells — the row-assembly form
    * that composes plain, hstore, and geometry columns correctly. The
    * caller appends the newline when streaming. */
  def copyLine(cells: Seq[CopyCell]): String = cells.map {
    case CopyNull          => "\\N"
    case CopyValue(s)      => copyEscape(s)
    case CopyPreEscaped(s) => s
  }.mkString("\t")

  /** A full COPY TEXT line: escaped values joined by tabs, None → \N
    * (add_null_column, src/db-copy-mgr.hpp:107). The caller appends
    * the newline when streaming. For rows containing hstore or
    * hex-geometry columns use [[copyLine]] — those wire forms are
    * already escaped and must not pass through [[copyEscape]] again. */
  def copyRow(values: Seq[Option[String]]): String =
    values.map {
      case None    => "\\N"
      case Some(s) => copyEscape(s)
    }.mkString("\t")

  /** Parse one COPY TEXT line back into column values — the inverse
    * of [[copyRow]]: split on tabs, `\N` → None, values unescaped.
    * (Only the escapes [[copyEscape]] emits are understood; PG's
    * octal/hex forms are not, so this reads OUR dumps, not arbitrary
    * pg_dump output.) */
  def copyRowParse(line: String): Seq[Option[String]] =
    line.split("\t", -1).toSeq.map {
      case "\\N" => None
      case v     => Some(copyUnescape(v))
    }

  /** Inverse of [[copyEscape]] for a single value (not a whole line:
    * it does not see column boundaries or the `\N` NULL marker — use
    * [[copyRowParse]] for that). */
  def copyUnescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'   => b.append('\n')
          case 'r'   => b.append('\r')
          case 't'   => b.append('\t')
          case other => b.append(other)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Rows → COPY TEXT wire lines, formatted in EXECUTORS — the
    * distributed half of the reference's db-copy pipeline
    * (src/db-copy.cpp buffers, here one `Dataset[String]` of
    * ready-to-stream lines). Column typing follows the DataFrame
    * schema: binary → hex EWKB, map<string,string> → hstore wire form,
    * boolean → t/f, null → \N, everything else the escaped string
    * value. `df` columns must already be in the table's column order
    * (id column first for tables with ids). `postgis=false` renders
    * binary as the bytea `\x` hex wire form instead of PostGIS's
    * bare hex EWKB. */
  def copyLines(df: DataFrame, t: FlexTableDef,
      postgis: Boolean = true): org.apache.spark.sql.Dataset[String] = {
    val expect = t.schema.fieldNames.toSeq
    require(df.columns.toSeq == expect,
      s"column order must match table '${t.name}': expected $expect, " +
        s"got ${df.columns.toSeq}")
    val schema = df.schema
    import df.sparkSession.implicits._
    df.map { row =>
      val cells = schema.fields.toIndexedSeq.zipWithIndex.map {
        case (f, i) =>
          if (row.isNullAt(i)) CopyNull
          else f.dataType match {
            case BinaryType if postgis =>
              CopyPreEscaped(hexGeomCopyValue(row.getAs[Array[Byte]](i)))
            case BinaryType => // bytea: \x hex, backslash COPY-escaped
              CopyPreEscaped(
                "\\\\x" + hexGeomCopyValue(row.getAs[Array[Byte]](i)))
            case MapType(StringType, StringType, _) =>
              CopyPreEscaped(hstoreCopyValue(
                row.getMap[String, String](i).toSeq))
            case BooleanType =>
              CopyValue(if (row.getBoolean(i)) "t" else "f")
            case _ => CopyValue(String.valueOf(row.get(i)))
          }
      }
      copyLine(cells)
    }
  }

  /** Rows → COPY BINARY tuples, encoded in EXECUTORS — the binary
    * sibling of [[copyLines]] (the PUBLIC binary COPY format: int16
    * field count, then per field int32 byte length + the type's
    * binary send representation; NULL = length −1). Binary skips the
    * server's text→datum parse, roughly halving bulk-load CPU there.
    *
    * Unlike COPY TEXT, binary is TYPE-EXACT: each field must be the
    * target column's wire type, so encoding is driven by the table
    * definition (FlexType → int2/int4/int8/float4/float8/bool/text/
    * timestamptz-µs-since-2000/hstore/jsonb/EWKB), not by lossy
    * stringification. Columns with a `sql_type` override are refused
    * loudly (their wire type is unknowable here) — load those tables
    * via COPY TEXT. */
  def binaryCopyRows(df: DataFrame, t: FlexTableDef,
      postgis: Boolean = true): org.apache.spark.sql.Dataset[Array[Byte]] = {
    val expect = t.schema.fieldNames.toSeq
    require(df.columns.toSeq == expect,
      s"column order must match table '${t.name}': expected $expect, " +
        s"got ${df.columns.toSeq}")
    t.writeColumns.foreach(c => require(c.sqlTypeOverride.isEmpty,
      s"binary COPY cannot encode column '${c.name}' with sql_type " +
        s"override '${c.sqlTypeOverride.get}' — use the TEXT path"))
    val nId = t.idFields.length
    val flexTypes: IndexedSeq[Option[FlexType.Value]] =
      (IndexedSeq.fill(nId)(None: Option[FlexType.Value]) ++
        t.writeColumns.map(c => Some(c.ctype))).toIndexedSeq
    val sparkTypes = df.schema.fields.map(_.dataType).toIndexedSeq
    import df.sparkSession.implicits._
    df.map { row =>
      val out = new java.io.ByteArrayOutputStream(64)
      val d = new java.io.DataOutputStream(out)
      d.writeShort(sparkTypes.length)
      var i = 0
      while (i < sparkTypes.length) {
        if (row.isNullAt(i)) d.writeInt(-1)
        else (flexTypes(i), sparkTypes(i)) match {
          // id fields: wire type from the Spark type (int8 ids,
          // char(1) type markers, int4 tile coordinates)
          case (None, LongType) => d.writeInt(8); d.writeLong(row.getLong(i))
          case (None, IntegerType) => d.writeInt(4); d.writeInt(row.getInt(i))
          case (None, StringType) =>
            val b = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            d.writeInt(b.length); d.write(b)
          case (Some(FlexType.Int8), _) | (Some(FlexType.IdNum), _) =>
            d.writeInt(8); d.writeLong(row.getLong(i))
          case (Some(FlexType.Int4), _) =>
            d.writeInt(4); d.writeInt(row.getInt(i))
          case (Some(FlexType.Int2), _) | (Some(FlexType.Direction), _) =>
            d.writeInt(2); d.writeShort(row.getShort(i))
          case (Some(FlexType.Real), _) =>
            d.writeInt(4); d.writeFloat(row.getFloat(i))
          case (Some(FlexType.DoublePrecision), _) =>
            d.writeInt(8); d.writeDouble(row.getDouble(i))
          case (Some(FlexType.Boolean), _) =>
            d.writeInt(1); d.writeByte(if (row.getBoolean(i)) 1 else 0)
          case (Some(FlexType.Text), _) | (Some(FlexType.IdType), _) =>
            val b = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            d.writeInt(b.length); d.write(b)
          case (Some(FlexType.Json), _) => // jsonb: version byte + text
            val b = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            d.writeInt(b.length + 1); d.writeByte(1); d.write(b)
          case (Some(FlexType.Timestamp), _) =>
            // timestamptz binary: µs since 2000-01-01 00:00:00 UTC
            val ts = row.getAs[java.sql.Timestamp](i)
            val micros = math.multiplyExact(ts.getTime, 1000L) +
              (ts.getNanos % 1000000) / 1000 - 946684800000000L
            d.writeInt(8); d.writeLong(micros)
          case (Some(FlexType.Hstore), _) =>
            val pairs = row.getMap[String, String](i).toSeq.sortBy(_._1)
            val body = new java.io.ByteArrayOutputStream(32)
            val bd = new java.io.DataOutputStream(body)
            bd.writeInt(pairs.length)
            pairs.foreach { case (k, v) =>
              val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              bd.writeInt(kb.length); bd.write(kb)
              if (v == null) bd.writeInt(-1)
              else {
                val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                bd.writeInt(vb.length); bd.write(vb)
              }
            }
            val b = body.toByteArray
            d.writeInt(b.length); d.write(b)
          case (_, BinaryType) =>
            // geometry binary send IS EWKB; bytea binary is raw bytes
            val b = row.getAs[Array[Byte]](i)
            d.writeInt(b.length); d.write(b)
          case (ft, st) => throw new IllegalArgumentException(
            s"binary COPY: unsupported column type $ft/$st at index $i")
        }
        i += 1
      }
      out.toByteArray
    }
  }

  /** Write the COPY bulk-load artifact: one text file per partition
    * under `dir`, each line a COPY TEXT row — the at-scale load shape
    * (executors format, any loader streams the files into
    * `COPY ... FROM STDIN`). PgLiveSpec round-trips the files through
    * a live server. */
  def writeCopyFiles(df: DataFrame, t: FlexTableDef, dir: String): Unit =
    copyLines(df, t).write.mode("overwrite").text(dir)

  /** libpq-style DSN → JDBC URL, the connection forms the reference
    * accepts on -d (dsn.feature: plain dbname, keyword/value pairs,
    * postgresql:// and postgres:// URIs). Defaults host=localhost,
    * port=5432 like libpq. Unrecognized keywords are passed through as
    * JDBC query params. */
  /** Any libpq -d form (plain dbname, keyword/value conninfo,
    * postgresql:// URI) → its connection-parameter map, mirroring the
    * reference's connection_params_t so -U/-H/-P/-W merge over it
    * (src/command-line-app.cpp:30-73). */
  def dsnParams(dsn: String): Map[String, String] = {
    val trimmed = dsn.trim
    if (trimmed.startsWith("postgresql://") ||
        trimmed.startsWith("postgres://")) {
      val u = new java.net.URI(trimmed)
      val creds = Option(u.getUserInfo).map(_.split(":", 2)).map(a =>
        Map("user" -> a(0)) ++
          (if (a.length > 1) Map("password" -> a(1)) else Map.empty))
        .getOrElse(Map.empty)
      val extra = Option(u.getQuery).toSeq.flatMap(_.split("&"))
        .map(_.split("=", 2)).collect {
          case Array(k, v) => k -> v
        }.toMap
      Option(u.getHost).filter(_.nonEmpty).map(h => Map("host" -> h))
        .getOrElse(Map.empty) ++
        (if (u.getPort > 0) Map("port" -> u.getPort.toString)
        else Map.empty) ++
        Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
          .map(d => Map("dbname" -> d)).getOrElse(Map.empty) ++
        creds ++ extra
    } else if (trimmed.contains('=')) {
      trimmed.split("\\s+").toSeq.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
    } else if (trimmed.isEmpty) Map.empty
    else Map("dbname" -> trimmed)
  }

  /** Parameter map → keyword/value conninfo, with libpq quoting for
    * values carrying spaces/quotes. */
  def conninfo(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1).map { case (k, v) =>
      val quoted =
        if (v.isEmpty || v.exists(c => c == ' ' || c == '\'' || c == '\\'))
          "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        else v
      s"$k=$quoted"
    }.mkString(" ")

  def jdbcUrlFromDsn(dsn: String): String = {
    def url(host: String, port: String, db: String,
        params: Seq[(String, String)]): String = {
      val q = params.filter(_._2.nonEmpty)
        .map { case (k, v) => s"$k=$v" }.mkString("&")
      s"jdbc:postgresql://$host:$port/$db" + (if (q.isEmpty) "" else s"?$q")
    }
    val trimmed = dsn.trim
    if (trimmed.startsWith("postgresql://") ||
        trimmed.startsWith("postgres://")) {
      val u = new java.net.URI(trimmed)
      val host = Option(u.getHost).filter(_.nonEmpty).getOrElse("localhost")
      val port = if (u.getPort > 0) u.getPort.toString else "5432"
      val db = Option(u.getPath).map(_.stripPrefix("/")).getOrElse("")
      val creds = Option(u.getUserInfo).map(_.split(":", 2)).map(a =>
        Seq("user" -> a(0)) ++
          (if (a.length > 1) Seq("password" -> a(1)) else Nil))
        .getOrElse(Nil)
      val extra = Option(u.getQuery).toSeq.flatMap(_.split("&"))
        .map(_.split("=", 2)).collect {
          case Array(k, v) => k -> v
          case Array(k)    => k -> ""
        }
      url(host, port, db, creds ++ extra)
    } else if (trimmed.contains('=')) {
      val kv = trimmed.split("\\s+").toSeq.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
      url(kv.getOrElse("host", "localhost"), kv.getOrElse("port", "5432"),
        kv.getOrElse("dbname", ""),
        (kv - "host" - "port" - "dbname").toSeq.sortBy(_._1))
    } else url("localhost", "5432", trimmed, Nil)
  }

  /** Distributed COPY load — the reference's wire protocol at the
    * cluster topology: executors format COPY TEXT lines
    * ([[copyLines]]) and each PARTITION streams its own
    * `COPY … FROM STDIN` over one [[PgWire]] connection (pure-JVM
    * protocol v3 — no psql subprocess, no JDBC driver), so an
    * N-partition load is N concurrent COPY writers, the shape the
    * reference's --number-processes fan-out approximates on one box
    * (src/db-copy.cpp:170-210). Returns the total rows the server
    * acknowledged (Σ per-partition COPY tags — a load that drops
    * rows cannot return quietly). The table must already exist
    * ([[createTableDdl]]); run [[postLoadDdl]] after. */
  def writeCopy(df: DataFrame, t: FlexTableDef, dsn: String,
      schema: String = "public", postgis: Boolean = true): Long =
    PgWire.copyPartitioned(copyLines(df, t, postgis), dsn,
      s""""$schema"."${t.name}"""")

  /** [[writeCopy]] over the BINARY wire format
    * ([[binaryCopyRows]] → [[PgWire.copyPartitionedBinary]]): same
    * staging/publish topology, roughly half the server-side parse
    * cost. PgLiveSpec proves TEXT and BINARY loads of the same frame
    * read back identically. */
  def writeCopyBinary(df: DataFrame, t: FlexTableDef, dsn: String,
      schema: String = "public", postgis: Boolean = true): Long =
    PgWire.copyPartitionedBinary(binaryCopyRows(df, t, postgis), dsn,
      s""""$schema"."${t.name}"""")

  /** Distributed load over generic JDBC: one connection + prepared
    * statement per partition, executeBatch every `batchSize` rows
    * (the COPY-buffer flush cadence, src/db-copy.hpp:140-163).
    * [[writeCopy]] is the PostgreSQL-native path; this one remains
    * for targets that only speak JDBC. */
  def write(df: DataFrame, t: FlexTableDef, jdbcUrl: String,
      batchSize: Int = 10000): Unit = {
    val sql = insertSql(t)
    val n = df.schema.fields.length
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn: Connection = DriverManager.getConnection(jdbcUrl)
      conn.setAutoCommit(false)
      try {
        val ps = conn.prepareStatement(sql)
        var pending = 0
        rows.foreach { row =>
          var i = 0
          while (i < n) { ps.setObject(i + 1, row.get(i)); i += 1 }
          ps.addBatch()
          pending += 1
          if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }
}
