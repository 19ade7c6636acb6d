package graft.flex

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The flex helper library (reference: src/init.lua:16-198) as Column
  * functions — the utilities every user config reaches for, kept
  * codegen-friendly (no UDFs).
  */
object Helpers {

  /** has_prefix / has_suffix (src/init.lua:16-28); null-in → null-out
    * like the Lua versions return nil. */
  def hasPrefix(str: Column, prefix: String): Column = str.startsWith(prefix)
  def hasSuffix(str: Column, suffix: String): Column = str.endsWith(suffix)

  /** clamp(value, low, high) (src/init.lua) — null passes through. */
  def clamp(value: Column, low: Column, high: Column): Column =
    least(greatest(value, low), high)

  /** trim (src/init.lua:179ish) */
  def trimStr(c: Column): Column = trim(c)

  /** split_string(str, separator): trimmed parts
    * (src/init.lua; default separator ";" like split_unit). */
  def splitString(c: Column, sep: String = ";"): Column =
    transform(split(c, java.util.regex.Pattern.quote(sep)), s => trim(s))

  /** split_unit("10 km", default) → (number, unit); non-numeric → null
    * struct fields (src/init.lua split_unit). */
  def splitUnit(c: Column, defaultUnit: String): Column = {
    val num = regexp_extract(trim(c), "^([+-]?[0-9.]+)", 1)
    val unit = trim(regexp_replace(trim(c), "^([+-]?[0-9.]+)\\s*", ""))
    struct(
      when(num === "", lit(null).cast("double"))
        .otherwise(num.cast("double")).as("value"),
      when(num === "", lit(null).cast("string"))
        .when(unit === "", lit(defaultUnit)).otherwise(unit).as("unit"))
  }

  /** make_check_values_func(list, default): value kept iff in list,
    * else default (or null) — as a Column transform factory. */
  def checkValues(allowed: Seq[String], default: Option[String] = None)
      : Column => Column = c =>
    when(c.isin(allowed: _*), c)
      .otherwise(default.map(lit(_)).getOrElse(lit(null)))

  /** make_clean_tags_func(keys): drop the given keys (+ trailing-*
    * wildcards) from a tags map; the "anything left?" boolean the Lua
    * version returns becomes `size(...) == 0`. */
  def cleanTagsFunc(keys: Seq[String]): Column => Column = tags =>
    graft.functions.TagFunctions.cleanTags(tags, keys)

  /** node_member_ids / way_member_ids (src/init.lua:190-198): member
    * refs of one type, in member order. */
  def memberIds(members: Column, mtype: String,
      typeField: String = "type", refField: String = "ref"): Column =
    transform(
      filter(members, m => m.getField(typeField) === mtype),
      m => m.getField(refField))
}
