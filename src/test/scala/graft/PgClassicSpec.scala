package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.classic.StyleFile
import graft.sinks.PgClassic

/** Classic-table materialization: -z/--hstore-column columns, the
  * norm/all hstore split with the z_order exclusion, DDL with
  * tablespaces/srid/--hstore-add-index (reference: src/table.cpp
  * write_row/write_hstore_columns/write_tags_column 254-349, start
  * 96-131, stop 177-245). */
class PgClassicSpec extends SparkSpecBase {

  private val style = StyleFile.parse(
    """node,way highway text linear
      |node,way name text linear
      |""".stripMargin)

  private def lineTable(hstore: Boolean, zCols: Seq[String] = Nil,
      srid: Int = 3857) =
    PgClassic.tables("planet_osm", style, hstore, zCols, srid)
      .find(_.kind == "line").get

  private def frame(tags: Map[String, String]*) = {
    val schema = StructType(Seq(
      StructField("osm_id", LongType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("z_order", IntegerType),
      StructField("way_area", DoubleType),
      StructField("geom", BinaryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(tags.zipWithIndex.map {
        case (t, i) => Row((i + 1).toLong, t, 5, 1.5, Array[Byte](1, 2))
      }),
      schema)
  }

  private val tagged = Map(
    "highway" -> "primary", "name" -> "Main",
    "name:en" -> "En", "name:de" -> "De", "z_order" -> "99")

  test("-z columns: prefix-stripped shortkeys, NULL when nothing matches") {
    val t = lineTable(hstore = false, zCols = Seq("name:"))
    val rows = PgClassic.copyFrame(
        frame(tagged, Map("highway" -> "track")), t)
      .orderBy("osm_id").collect()
    assert(rows.head.getMap[String, String](
      rows.head.fieldIndex("name:")) == Map("en" -> "En", "de" -> "De"))
    // no matching tag → NULL column, not an empty hstore
    assert(rows(1).isNullAt(rows(1).fieldIndex("name:")))
  }

  test("norm (-k) tags exclude column keys + z_order; all (-j) keeps columns") {
    val t = lineTable(hstore = true)
    val norm = PgClassic.copyFrame(frame(tagged), t).collect().head
    assert(norm.getMap[String, String](norm.fieldIndex("tags")) ==
      Map("name:en" -> "En", "name:de" -> "De"))
    val all = PgClassic
      .copyFrame(frame(tagged), t, hstoreAll = true).collect().head
    // -j keeps column-matched keys but still drops a literal z_order
    // tag (write_tags_column, src/table.cpp:305-318)
    assert(all.getMap[String, String](all.fieldIndex("tags")) ==
      tagged - "z_order")
  }

  test("copy column order: osm_id, style, -z columns, tags, way") {
    val t = lineTable(hstore = true, zCols = Seq("name:", "addr:"))
    assert(t.copyColumnNames == Seq("osm_id", "highway", "name",
      "z_order", "way_area", "name:", "addr:", "tags", "way"))
    assert(PgClassic.copyFrame(frame(tagged), t).columns.toSeq ==
      t.copyColumnNames)
  }

  test("int4 escape_type goldens (test-output-pgsql-int4.cpp, all 23)") {
    // the reference fixture's population values in node order 1..23
    val values = Seq(
      "10000000000000000000", "10000000000", "2147483648", // → NULL
      "2147483647", "10000", "-10000", "-2147483648",      // limits
      "-2147483649", "-10000000000", "-10000000000000000000", // NULL
      "10000000000000000000-20000000000000000000",         // NULL
      "10000000000-20000000000",                           // NULL
      "2147483646-2147483648", "10000-20000", "-10000--20000",
      "-2147483647--2147483649",                           // range means
      "-10000000000--20000000000",
      "-10000000000000000000--20000000000000000000",       // NULL
      "", "-", "--", "abc",                                // NULL
      "0")
    val expected = Seq[Any](null, null, null,
      2147483647L, 10000L, -10000L, -2147483648L,
      null, null, null, null, null,
      2147483647L, 15000L, -15000L, -2147483648L, null, null,
      null, null, null, null, 0L)
    val style = StyleFile.parse(
      """node,way population int4 linear
        |node,way name text linear
        |""".stripMargin)
    val t = PgClassic.tables("t", style, hstore = false)
      .find(_.kind == "point").get
    val schema = StructType(Seq(
      StructField("osm_id", LongType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("lon", DoubleType), StructField("lat", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.zipWithIndex.map {
        case (v, i) => Row((i + 1).toLong,
          Map("population" -> v, "name" -> s"n$i"), 1.0, 2.0)
      }), schema)
    val got = PgClassic.copyFrame(df, t).orderBy("osm_id")
      .select("population").collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got == expected)
  }

  test("real escape_type: comma marks, ranges, feet (table.cpp:390-423)") {
    val cases = Seq(
      "3.5" -> 3.5, "3,5" -> 3.5, "2-4" -> 3.0,
      "10ft" -> 10 * 0.3048, "10-20ft" -> 15 * 0.3048,
      "1e2" -> 100.0, "-2.5--3.5" -> -3.0)
    val nulls = Seq("abc", "", "-")
    val style = StyleFile.parse("node,way width real linear\n")
    val t = PgClassic.tables("t", style, hstore = false)
      .find(_.kind == "point").get
    val schema = StructType(Seq(
      StructField("osm_id", LongType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("lon", DoubleType), StructField("lat", DoubleType)))
    val all = cases.map(_._1) ++ nulls
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(all.zipWithIndex.map {
        case (v, i) => Row((i + 1).toLong, Map("width" -> v), 1.0, 2.0)
      }), schema)
    val got = PgClassic.copyFrame(df, t).orderBy("osm_id")
      .select("width").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) != null && math.abs(got(i).asInstanceOf[Double] - want)
        < 1e-12, s"$in -> ${got(i)}, want $want")
    }
    nulls.indices.foreach(i => assert(got(cases.size + i) == null))
  }

  test("create DDL: hstore columns, srid typmod, tablespace clause") {
    val t = lineTable(hstore = true, zCols = Seq("name:"), srid = 4326)
    val ddl = PgClassic.createDdl(t, tablespace = Some("fastdisk"))
    assert(ddl.contains(""""name:" hstore, "tags" hstore"""))
    assert(ddl.contains(""""way" geometry(linestring,4326)"""))
    assert(ddl.endsWith("""WITH (autovacuum_enabled = off) TABLESPACE "fastdisk""""))
    assert(PgClassic.createDdl(lineTable(hstore = false))
      .contains("geometry(linestring,3857)"))
  }

  test("post-load DDL: hstore GIN indexes, index tablespace, fillfactor") {
    val t = lineTable(hstore = true, zCols = Seq("name:"))
    val ddl = PgClassic.postLoadDdl(t, slim = false, hstoreIndex = true,
      tablespaceIndex = Some("idx"))
    // un-updatable imports pack the GiST index (table.cpp:208-211)
    assert(ddl.exists(d => d.contains("USING gist") &&
      d.contains("WITH (fillfactor = 100)") && d.contains("""TABLESPACE "idx"""")))
    assert(ddl.exists(_.contains("""USING gin ("tags") TABLESPACE "idx"""")))
    assert(ddl.exists(_.contains("""USING gin ("name:") TABLESPACE "idx"""")))
    // updatable (slim) keeps default fillfactor + adds the id index
    val slim = PgClassic.postLoadDdl(t, slim = true)
    assert(slim.exists(d => d.contains("USING gist") &&
      !d.contains("fillfactor")))
    assert(slim.exists(_.contains("""("osm_id")""")))
    // no GIN without --hstore-add-index
    assert(!slim.exists(_.contains("gin")))
  }
}
