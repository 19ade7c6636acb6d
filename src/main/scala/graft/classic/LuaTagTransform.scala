package graft.classic

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.lua._

/** The classic output's Lua tag transform (`--tag-transform-script`,
  * reference: src/tagtransform-lua.cpp): a user style script defining
  * `filter_tags_node`, `filter_tags_way`, `filter_basic_tags_rel` and
  * `filter_tags_relation_member`, run through the embedded Lua
  * runtime as [[ClassicPipeline.TagTransform]] closures — one
  * interpreter per partition, rows streamed through, exactly the
  * protocol the reference drives per object:
  *
  *  - node/rel: `f(kv, n)` → `(filter, tags)`
  *  - way: `f(kv, n)` → `(filter, tags, polygon, roads)`
  *  - relation member: `f(kv, member_kvs, roles, n)` →
  *    `(filter, tags, superseded*, make_boundary, make_polygon,
  *    roads)` (*obsolete, ignored — tagtransform-lua.cpp:203-205)
  *
  * `filter` truthiness follows lua_tointeger (a non-zero integer
  * filters the object OUT; booleans read as 0). The way/relation
  * transforms put `z_order` into the out tags (the documented Lua
  * idiom, style.lua add_z_order); the closures surface it as the
  * `__z` column and strip it from the exported tag map, so the
  * result shape matches the C-transform path.
  */
object LuaTagTransform {

  def fromFile(path: String, extraAttributes: Boolean = false)
      : ClassicPipeline.TagTransform = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    fromSource(src, java.nio.file.Paths.get(path).getFileName.toString,
      extraAttributes)
  }

  def fromSource(src: String, chunkName: String = "style.lua",
      extraAttributes: Boolean = false): ClassicPipeline.TagTransform = {
    // load once driver-side to validate (the reference's startup
    // checks: dofile + the four functions must exist,
    // tagtransform-lua.cpp:21-45)
    val I = new LuaInterp(chunkName)
    LuaStdlib.install(I)
    try I.runSource(src)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"Lua tag transform style error: ${e.getMessage}.")
    }
    Seq("filter_tags_node", "filter_tags_way", "filter_basic_tags_rel",
      "filter_tags_relation_member").foreach { fn =>
      I.globals.rawGet(LStr(fn)) match {
        case _: LFunc | _: LBuiltin => ()
        case _ => throw new IllegalArgumentException(
          s"Tag transform style does not contain a function $fn.")
      }
    }
    ClassicPipeline.TagTransform(
      node = Some(entityPass(src, chunkName, "filter_tags_node",
        isWay = false, extraAttributes)),
      way = Some(entityPass(src, chunkName, "filter_tags_way",
        isWay = true, extraAttributes)),
      relation = Some(entityPass(src, chunkName, "filter_basic_tags_rel",
        isWay = false, extraAttributes)),
      relationMember = Some(relMemberPass(src, chunkName)))
  }

  /** kv table for one object's tags (+ attribute pseudo-tags under
    * -x: osm_user/uid/version/timestamp/changeset,
    * taglist_t::add_attributes). */
  private def kvTable(tags: Map[String, String]): LTable = {
    val t = new LTable
    tags.foreach { case (k, v) => t.rawSet(LStr(k), LStr(v)) }
    t
  }

  private def outTags(I: LuaInterp, v: LV): Map[String, String] = v match {
    case t: LTable => t.entries.map { case (k, tv) =>
      (k match {
        case LStr(s) => s
        case other => throw new IllegalArgumentException(
          "Basic tag processing found incorrect data type " +
            s"'${other.typeName}', use a string.")
      }) -> I.tostring(tv)
    }.toMap
    case _ => Map.empty
  }

  private def filtered(I: LuaInterp, v: LV): Boolean =
    I.toInteger(v).exists(_ != 0)

  private def attrTags(r: Row, schema: StructType): Map[String, String] = {
    def get(n: String): Option[String] = {
      val i = schema.fieldNames.indexOf(n)
      if (i < 0 || r.isNullAt(i)) None else Some(r.get(i).toString)
    }
    Map.empty[String, String] ++
      get("user").filter(_.nonEmpty).map("osm_user" -> _) ++
      get("uid").map("osm_uid" -> _) ++
      get("version").map("osm_version" -> _) ++
      get("timestamp").map("osm_timestamp" -> _) ++
      get("changeset").map("osm_changeset" -> _)
  }

  private def entityPass(src: String, chunkName: String, fnName: String,
      isWay: Boolean, extraAttributes: Boolean)
      : DataFrame => DataFrame = { df =>
    val schema = df.schema
    val outSchema = {
      var s = schema
        .add("__keep", BooleanType)
        .add("__outtags", MapType(StringType, StringType))
      if (isWay) s = s.add("__polygon", BooleanType)
        .add("__roads", BooleanType).add("__z", IntegerType)
      s
    }
    val iTags = schema.fieldNames.indexOf("tags")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val I = new LuaInterp(chunkName)
      LuaStdlib.install(I)
      I.runSource(src)
      val fn = I.globals.rawGet(LStr(fnName))
      rows.map { row =>
        val baseTags =
          if (iTags < 0 || row.isNullAt(iTags)) Map.empty[String, String]
          else row.getMap[String, String](iTags).toMap
        val tags = if (extraAttributes)
          baseTags ++ attrTags(row, schema) else baseTags
        val rets = I.call(fn, Seq(kvTable(tags), LInt(tags.size.toLong)))
        val keep = !filtered(I, rets.headOption.getOrElse(LNil))
        val out = outTags(I, rets.lift(1).getOrElse(LNil))
        val extra: Seq[Any] =
          if (!isWay) Seq(keep, out - "z_order")
          else Seq(keep, out - "z_order",
            filtered(I, rets.lift(2).getOrElse(LNil)), // polygon
            filtered(I, rets.lift(3).getOrElse(LNil)), // roads
            out.get("z_order").flatMap(_.toIntOption).getOrElse(0))
        Row.fromSeq(row.toSeq ++ extra)
      }
    }
  }

  /** filter_tags_relation_member over relations joined with their
    * ordered member-way tag maps (`__mtags`) and roles (`__mroles`).
    * Overrides __keep/__outtags/__boundary/__mkpoly/__roads/__z. */
  private def relMemberPass(src: String, chunkName: String)
      : DataFrame => DataFrame = { df =>
    val schema = df.schema
    val drop = Set("__keep", "__outtags", "__boundary", "__mkpoly",
      "__roads", "__z")
    val keptFields = schema.fields.filterNot(f => drop.contains(f.name))
    val outSchema = StructType(keptFields)
      .add("__keep", BooleanType)
      .add("__outtags", MapType(StringType, StringType))
      .add("__boundary", BooleanType)
      .add("__mkpoly", BooleanType)
      .add("__roads", BooleanType)
      .add("__z", IntegerType)
    val keptIdx = keptFields.map(f => schema.fieldNames.indexOf(f.name))
    val iTags = schema.fieldNames.indexOf("tags")
    val iMtags = schema.fieldNames.indexOf("__mtags")
    val iMroles = schema.fieldNames.indexOf("__mroles")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val I = new LuaInterp(chunkName)
      LuaStdlib.install(I)
      I.runSource(src)
      val fn = I.globals.rawGet(LStr("filter_tags_relation_member"))
      rows.map { row =>
        val tags =
          if (iTags < 0 || row.isNullAt(iTags)) Map.empty[String, String]
          else row.getMap[String, String](iTags).toMap
        val mtags: Seq[Map[String, String]] =
          if (iMtags < 0 || row.isNullAt(iMtags)) Nil
          else row.getSeq[scala.collection.Map[String, String]](iMtags)
            .map(m => if (m == null) Map.empty[String, String] else m.toMap)
        val roles: Seq[String] =
          if (iMroles < 0 || row.isNullAt(iMroles)) Nil
          else row.getSeq[String](iMroles).map(r => if (r == null) "" else r)
        val memberKvs = LTable.fromSeq(mtags.map(kvTable))
        val roleT = LTable.fromSeq(roles.map(LStr))
        val rets = I.call(fn, Seq(kvTable(tags), memberKvs, roleT,
          LInt(mtags.size.toLong)))
        // (filter, tags, superseded-ignored, boundary, polygon, roads)
        val keep = !filtered(I, rets.headOption.getOrElse(LNil))
        val out = outTags(I, rets.lift(1).getOrElse(LNil))
        Row.fromSeq(keptIdx.map(row.get(_)).toSeq ++ Seq(
          keep, out - "z_order",
          filtered(I, rets.lift(3).getOrElse(LNil)),
          filtered(I, rets.lift(4).getOrElse(LNil)),
          filtered(I, rets.lift(5).getOrElse(LNil)),
          out.get("z_order").flatMap(_.toIntOption).getOrElse(0)))
      }
    }
  }
}
