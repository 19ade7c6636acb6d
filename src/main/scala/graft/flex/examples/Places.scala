package graft.flex.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.flex._

/** Typed port of flex-config/places.lua — nested JSON: all name:*
  * tags move into a `names` sub-object keyed by language (plain
  * `name` under the empty key), population becomes a JSON number.
  * The nested document is built by a small serializer UDF because
  * its value types are heterogeneous (strings, object, number). */
object Places extends FlexConfig {

  private val places = FlexTableDef("places", FlexIds.Node, Seq(
    FlexColumn("tags", FlexType.Json),
    FlexColumn("geom", FlexType.Point)))

  override def tables: Seq[FlexTableDef] = Seq(places)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** places.lua:17-45 as one pass over the tag map. */
  private val placeJson = udf((tags: Map[String, String]) => {
    val names = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rest = scala.collection.mutable.LinkedHashMap.empty[String, String]
    tags.toSeq.sortBy(_._1).foreach {
      case ("name", v)                      => names("") = v
      case (k, v) if k.startsWith("name:")  => names(k.drop(5)) = v
      case (k, v)                           => rest(k) = v
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    rest.foreach { case (k, v) =>
      if (k == "population" && v.matches("-?\\d+(\\.\\d+)?"))
        parts += s"${jsonStr(k)}:$v" // number, not string
      else parts += s"${jsonStr(k)}:${jsonStr(v)}"
    }
    if (names.nonEmpty)
      parts += s""""names":${names.map { case (k, v) =>
        s"${jsonStr(k)}:${jsonStr(v)}" }.mkString("{", ",", "}")}"""
    parts.mkString("{", ",", "}")
  })

  override def processNodes(nodes: DataFrame): Map[String, DataFrame] =
    Map("places" -> nodes
      .where(col("tags").getItem("place").isNotNull)
      .select(col("id").as("osm_id"),
        placeJson(col("tags")).as("tags"),
        FlexGeom.asPoint()(col("lon"), col("lat")).as("geom")))
}
