package graft.lua

import graft.SparkSpecBase

/** Port of tests/test-output-flex-types.cpp over the reference's
  * `test_output_flex_types.lua`: the full column-coercion matrix
  * (nil/boolean/number/string/table per declared type, range
  * overflow → NULL, invalid values → NULL or errors). PG-specific
  * assertion forms translate: hstore text literals compare as maps,
  * `::jsonb` equality on scalars is plain string equality on the json
  * text, and the complex-document case checks per-key with
  * get_json_object (jsonb canonicalizes key order; our json is the
  * insert-order text — same content). */
class FlexTypesCppSpec extends SparkSpecBase {

  private val conf = "test_output_flex_types.lua"
  private val N = "nodes"

  private def imp(tags: String): FlexCppHarness = {
    val db = new FlexCppHarness(spark, conf)
    db.runImport(s"n10 v1 dV x10.0 y10.0 T$tags\n", append = false)
    db
  }

  private def impFails(tags: String): Unit = {
    val db = new FlexCppHarness(spark, conf)
    intercept[Exception] {
      db.runImport(s"n10 v1 dV x10.0 y10.0 T$tags\n", append = false)
    }
    assert(db.countOrZero(N) == 0)
  }

  test("type nil") {
    val db = imp("type=nil")
    assert(db.count(N) == 1)
    assert(db.count(N, "ttext IS NULL AND tbool IS NULL AND " +
      "tint2 IS NULL AND tint4 IS NULL AND tint8 IS NULL AND " +
      "treal IS NULL AND tdubl IS NULL AND thstr IS NULL AND " +
      "tjson IS NULL AND tdirn IS NULL AND tsqlt IS NULL") == 1)
  }

  test("type boolean") {
    val db = imp("type=boolean")
    assert(db.count(N) == 2)
    assert(db.count(N, "tbool = true AND tint2 = 1 AND tint4 = 1 AND " +
      "tint8 = 1 AND tjson = 'true' AND tdirn = 1") == 1)
    assert(db.count(N, "tbool = false AND tint2 = 0 AND tint4 = 0 AND " +
      "tint8 = 0 AND tjson = 'false' AND tdirn = 0") == 1)
  }

  test("type boolean in column where it doesn't belong") {
    Seq("ttext", "treal", "tdubl", "thstr", "tsqlt").foreach(c =>
      impFails(s"type=boolean-fail,column=$c"))
  }

  test("type number") {
    val db = imp("type=number")
    assert(db.count(N) == 19)
    // (sqlt-int-part, int2, int4, int8 present, real present, dirn)
    def chk(ip: String, i2: String, i4: String, i8: String,
        realCmp: String, dirn: Int, json: String): Unit =
      assert(db.count(N, s"split_part(tsqlt, '.', 1) = '$ip' AND " +
        s"ttext = tsqlt AND tint2 $i2 AND tint4 $i4 AND tint8 $i8 " +
        s"AND $realCmp tjson = '$json' AND tdirn = $dirn") == 1,
        s"number row $ip")
    chk("-2147483649", "IS NULL", "IS NULL", "= -2147483649",
      "tdubl = -2147483649 AND", -1, "-2147483649")
    chk("-2147483648", "IS NULL", "= -2147483648", "= -2147483648",
      "tdubl = -2147483648 AND", -1, "-2147483648")
    chk("-2147483647", "IS NULL", "= -2147483647", "= -2147483647",
      "tdubl = -2147483647 AND", -1, "-2147483647")
    chk("-32769", "IS NULL", "= -32769", "= -32769",
      "treal = -32769 AND tdubl = -32769 AND", -1, "-32769")
    chk("-32768", "= -32768", "= -32768", "= -32768",
      "treal = -32768 AND tdubl = -32768 AND", -1, "-32768")
    chk("-32767", "= -32767", "= -32767", "= -32767",
      "treal = -32767 AND tdubl = -32767 AND", -1, "-32767")
    chk("-2", "= -2", "= -2", "= -2",
      "treal = -2 AND tdubl = -2 AND", -1, "-2")
    chk("-1", "= -1", "= -1", "= -1",
      "treal = -1 AND tdubl = -1 AND", -1, "-1")
    assert(db.count(N, "tsqlt = '-0.5' AND ttext = tsqlt AND " +
      "tbool = true AND tint2 = 0 AND tint4 = 0 AND tint8 = 0 AND " +
      "treal = -0.5 AND tdubl = -0.5 AND tjson = '-0.5' AND " +
      "tdirn = -1") == 1)
    assert(db.count(N, "split_part(tsqlt, '.', 1) = '0' AND " +
      "ttext = tsqlt AND tbool = false AND tint2 = 0 AND tint4 = 0 " +
      "AND tint8 = 0 AND treal = 0 AND tdubl = 0 AND tjson = '0' AND " +
      "tdirn = 0") == 1)
    assert(db.count(N, "tsqlt = '0.5' AND ttext = tsqlt AND " +
      "tbool = true AND tint2 = 0 AND tint4 = 0 AND tint8 = 0 AND " +
      "treal = 0.5 AND tdubl = 0.5 AND tjson = '0.5' AND " +
      "tdirn = 1") == 1)
    chk("1", "= 1", "= 1", "= 1", "treal = 1 AND tdubl = 1 AND", 1, "1")
    chk("2", "= 2", "= 2", "= 2", "treal = 2 AND tdubl = 2 AND", 1, "2")
    chk("32767", "= 32767", "= 32767", "= 32767",
      "treal = 32767 AND tdubl = 32767 AND", 1, "32767")
    chk("32768", "IS NULL", "= 32768", "= 32768",
      "treal = 32768 AND tdubl = 32768 AND", 1, "32768")
    chk("32769", "IS NULL", "= 32769", "= 32769",
      "treal = 32769 AND tdubl = 32769 AND", 1, "32769")
    chk("2147483647", "IS NULL", "= 2147483647", "= 2147483647",
      "tdubl = 2147483647 AND", 1, "2147483647")
    chk("2147483648", "IS NULL", "IS NULL", "= 2147483648",
      "tdubl = 2147483648 AND", 1, "2147483648")
    chk("2147483649", "IS NULL", "IS NULL", "= 2147483649",
      "tdubl = 2147483649 AND", 1, "2147483649")
  }

  test("type string (with bool)") {
    val db = imp("type=string-bool")
    assert(db.count(N) == 9)
    assert(db.count(N, "tbool = true  AND ttext = 'istrue'") == 3)
    assert(db.count(N, "tbool = false AND ttext = 'isfalse'") == 3)
    assert(db.count(N, "tbool IS NULL AND ttext = 'isnull'") == 3)
  }

  test("type string (with direction)") {
    val db = imp("type=string-direction")
    assert(db.count(N) == 9)
    assert(db.count(N, "tdirn = tint2") == 5)
    assert(db.count(N, "tdirn IS NULL AND tint2 IS NULL") == 4)
  }

  test("type string (with number)") {
    val db = imp("type=string-with-number")
    assert(db.count(N) == 18)
    def chk(s: String, i2: String, i4: String, i8: String,
        real: String): Unit =
      assert(db.count(N, s"tsqlt = '$s' AND ttext = tsqlt AND " +
        s"tint2 $i2 AND tint4 $i4 AND tint8 $i8 $real") == 1,
        s"string-number row $s")
    chk("-2147483649", "IS NULL", "IS NULL", "= -2147483649",
      "AND tdubl = -2147483649")
    chk("-2147483648", "IS NULL", "= -2147483648", "= -2147483648",
      "AND tdubl = -2147483648")
    chk("-2147483647", "IS NULL", "= -2147483647", "= -2147483647",
      "AND tdubl = -2147483647")
    chk("-32769", "IS NULL", "= -32769", "= -32769",
      "AND treal = -32769 AND tdubl = -32769")
    chk("-32768", "= -32768", "= -32768", "= -32768",
      "AND treal = -32768 AND tdubl = -32768")
    chk("-32767", "= -32767", "= -32767", "= -32767",
      "AND treal = -32767 AND tdubl = -32767")
    chk("-2", "= -2", "= -2", "= -2", "AND treal = -2 AND tdubl = -2")
    chk("-1", "= -1", "= -1", "= -1", "AND treal = -1 AND tdubl = -1")
    chk("0", "= 0", "= 0", "= 0", "AND treal = 0 AND tdubl = 0")
    chk("1", "= 1", "= 1", "= 1", "AND treal = 1 AND tdubl = 1")
    chk("2", "= 2", "= 2", "= 2", "AND treal = 2 AND tdubl = 2")
    chk("32767", "= 32767", "= 32767", "= 32767",
      "AND treal = 32767 AND tdubl = 32767")
    chk("32768", "IS NULL", "= 32768", "= 32768",
      "AND treal = 32768 AND tdubl = 32768")
    chk("32769", "IS NULL", "= 32769", "= 32769",
      "AND treal = 32769 AND tdubl = 32769")
    chk("2147483647", "IS NULL", "= 2147483647", "= 2147483647",
      "AND tdubl = 2147483647")
    chk("2147483648", "IS NULL", "IS NULL", "= 2147483648",
      "AND tdubl = 2147483648")
    chk("2147483649", "IS NULL", "IS NULL", "= 2147483649",
      "AND tdubl = 2147483649")
    chk(" 42", "= 42", "= 42", "= 42", "AND treal = 42 AND tdubl = 42")
  }

  test("type string (with invalid number)") {
    val db = imp("type=string-with-invalid-number")
    assert(db.count(N) == 7)
    Seq("", "abc", "0a", "--1", "1foo").foreach(s =>
      assert(db.count(N, s"ttext = '$s' AND tint2 IS NULL AND " +
        "tint4 IS NULL AND tint8 IS NULL AND treal IS NULL AND " +
        "tdubl IS NULL") == 1, s"invalid '$s'"))
    assert(db.count(N, "ttext = '0xa' AND tint2 IS NULL AND " +
      "tint4 IS NULL AND tint8 IS NULL AND " +
      "abs(treal - 10) < 0.0000001 AND abs(tdubl - 10) < 0.0000001")
      == 1)
    assert(db.count(N, "ttext = '1.2' AND tint2 IS NULL AND " +
      "tint4 IS NULL AND tint8 IS NULL AND " +
      "abs(treal - 1.2) < 0.0000001 AND abs(tdubl - 1.2) < 0.0000001")
      == 1)
  }

  test("type number in column where it doesn't belong") {
    impFails("type=number-fail,column=thstr")
  }

  test("Adding a function should always fail") {
    Seq("ttext", "tbool", "tint2", "tint4", "tint8", "treal", "tdubl",
      "thstr", "tdirn", "tsqlt").foreach(c =>
      impFails(s"type=function-fail,column=$c"))
  }

  test("type table") {
    val db = imp("type=table")
    assert(db.count(N) == 2)
    assert(db.count(N, "size(thstr) = 0 AND tjson = '{}'") == 1)
    assert(db.count(N, "size(thstr) = 2 AND thstr['a'] = 'b' AND thstr['c'] = 'd' AND " +
      "(get_json_object(tjson, '$.a') = 'b' AND " +
      "get_json_object(tjson, '$.c') = 'd')") == 1)
  }

  test("Adding a table with non-strings should fail for hstore") {
    impFails("type=table-hstore-fail")
  }

  test("Adding a table should fail except for hstore and json/jsonb") {
    Seq("ttext", "tbool", "tint2", "tint4", "tint8", "treal", "tdubl",
      "tdirn", "tsqlt").foreach(c =>
      impFails(s"type=table-fail,column=$c"))
  }

  test("Adding a complex table in jsonb") {
    val db = imp("type=json")
    assert(db.count(N,
      "get_json_object(tjson, '$.astring') = '123' AND " +
      "get_json_object(tjson, '$.aninteger') = '124' AND " +
      "get_json_object(tjson, '$.anumber') = '12.5' AND " +
      "get_json_object(tjson, '$.atrue') = 'true' AND " +
      "get_json_object(tjson, '$.afalse') = 'false' AND " +
      "get_json_object(tjson, '$.atable.a') = 'nested' AND " +
      "get_json_object(tjson, '$.atable.tab') = 'le' AND " +
      "get_json_object(tjson, '$.anarray[0]') = '4' AND " +
      "get_json_object(tjson, '$.anarray[1]') = '3' AND " +
      "get_json_object(tjson, '$.anarray[2]') = '7'") == 1)
  }

  test("Adding a table with a loop should fail") {
    impFails("type=json-loop")
  }
}
