package graft

import org.apache.spark.sql.types._

/** Guards the harness against testdata drift: reads every table
  * [[Tables]] serves at sf0.001 and asserts the dtypes the query
  * corpus assumes. A regenerated /root/testdata with a changed
  * physical schema (e.g. the round-6 events.ts nanos→micros flip that
  * broke 12 queries at bench time) fails HERE in seconds instead.
  */
class SchemaGuardSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def fieldTypes(name: String): Map[String, DataType] =
    Tables.load(spark, sfDir, name).schema
      .map(f => f.name -> f.dataType).toMap

  test("region / nation key and name types") {
    assert(fieldTypes("region") ==
      Map("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fieldTypes("nation") == Map("n_nationkey" -> IntegerType,
      "n_name" -> StringType, "n_regionkey" -> IntegerType))
  }

  test("customer / supplier / part column types") {
    assert(fieldTypes("customer") == Map("c_custkey" -> LongType,
      "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(fieldTypes("supplier") == Map("s_suppkey" -> LongType,
      "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assert(fieldTypes("part") == Map("p_partkey" -> LongType,
      "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
  }

  test("orders / lineitem column types (timestamps read as timestamp)") {
    val o = fieldTypes("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(o("o_orderdate").isInstanceOf[TimestampNTZType.type] ||
      o("o_orderdate").isInstanceOf[TimestampType.type],
      s"o_orderdate must be a timestamp, got ${o("o_orderdate")}")
    val l = fieldTypes("lineitem")
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .forall(l(_) == DoubleType))
    assert(l("l_linenumber") == IntegerType)
    assert(l("l_shipdate").isInstanceOf[TimestampNTZType.type] ||
      l("l_shipdate").isInstanceOf[TimestampType.type])
  }

  test("events surfaces a regular TimestampType ts in every layout") {
    // Tables.events adapts to both historical layouts (int64 nanos,
    // native timestamp[us]); the contract downstream queries rely on
    // is a plain TimestampType column.
    val e = Tables.events(spark, sfDir).schema
      .map(f => f.name -> f.dataType).toMap
    assert(e("ts") == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${e("ts")}")
    assert(e("event_id") == LongType && e("user_id") == LongType)
    assert(e("event_type") == StringType && e("value") == DoubleType)
    assert(e("props") == StringType)
  }

  test("documents / embeddings column types") {
    assert(fieldTypes("documents") == Map("doc_id" -> LongType,
      "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val em = fieldTypes("embeddings")
    assert(em("vec_id") == LongType && em("label") == IntegerType)
    assert(em("embedding") == ArrayType(FloatType, containsNull = true) ||
      em("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${em("embedding")}")
  }

  test("all three scale factors share the events ts layout") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dt = Tables.events(spark, s"/root/testdata/$sf").schema("ts").dataType
      assert(dt == TimestampType, s"$sf events.ts → $dt")
    }
  }
}
