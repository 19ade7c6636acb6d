package graft.flex.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.flex._
import graft.geom.Srid

/** Typed port of flex-config/attributes.lua — object attributes
  * (version, changeset, timestamp as ISO text, uid, user) next to
  * tags and 4326 geometry; way node lists and relation member lists
  * land as PG array text / jsonb. */
object Attributes extends FlexConfig {

  private def attrCols: Seq[FlexColumn] = Seq(
    FlexColumn("version", FlexType.Int4),
    FlexColumn("changeset", FlexType.Int4),
    FlexColumn("created", FlexType.Text,
      sqlTypeOverride = Some("timestamp")),
    FlexColumn("uid", FlexType.Int4),
    FlexColumn("user", FlexType.Text))

  private val nodes = FlexTableDef("attributes_nodes", FlexIds.Node,
    Seq(FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Point, projection = Srid.WGS84)) ++
      attrCols)

  private val ways = FlexTableDef("attributes_ways", FlexIds.Way,
    Seq(FlexColumn("tags", FlexType.Json),
      FlexColumn("geom", FlexType.Linestring, projection = Srid.WGS84)) ++
      attrCols :+
      FlexColumn("nodes", FlexType.Text,
        sqlTypeOverride = Some("bigint[]")))

  private val relations = FlexTableDef("attributes_relations",
    FlexIds.Relation,
    Seq(FlexColumn("tags", FlexType.Json)) ++ attrCols :+
      FlexColumn("members", FlexType.Json))

  override def tables: Seq[FlexTableDef] = Seq(nodes, ways, relations)

  /** format_date (attributes.lua:52-54): epoch seconds → ISO UTC. */
  private def created(df: DataFrame): Column =
    if (df.columns.contains("timestamp"))
      date_format(timestamp_seconds(col("timestamp")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    else lit(null)

  private def opt(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null)

  private def shared(df: DataFrame): Seq[Column] = Seq(
    opt(df, "version").cast("int").as("version"),
    opt(df, "changeset").cast("int").as("changeset"),
    created(df).as("created"),
    opt(df, "uid").cast("int").as("uid"),
    opt(df, "user").as("user"))

  override def processNodes(nodes0: DataFrame): Map[String, DataFrame] =
    Map("attributes_nodes" -> nodes0.where(size(col("tags")) > 0)
      .select(Seq(col("id").as("osm_id"), col("tags").as("tags"),
        FlexGeom.asPoint(Srid.WGS84)(col("lon"), col("lat")).as("geom")) ++
        shared(nodes0): _*))

  override def processWays(ways0: DataFrame): Map[String, DataFrame] =
    // reference dispatch: process_way runs for TAGGED ways only;
    // attributes.lua defines no process_untagged_way, so untagged
    // ways are skipped (output-flex.cpp:1151 tags().empty() routing)
    Map("attributes_ways" -> ways0.where(size(col("tags")) > 0).select(
      Seq(col("id").as("osm_id"), col("tags").as("tags"),
        FlexGeom.asLinestring(Srid.WGS84)(col("__lons"), col("__lats"))
          .as("geom")) ++
        shared(ways0) :+
        concat(lit("{"), concat_ws(",", col("nodes")), lit("}"))
          .as("nodes"): _*))

  override def processRelations(rels: DataFrame): Map[String, DataFrame] =
    Map("attributes_relations" -> rels.select(
      Seq(col("id").as("osm_id"), col("tags").as("tags")) ++
        shared(rels) :+
        to_json(col("members")).as("members"): _*))
}
