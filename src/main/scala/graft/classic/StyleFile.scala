package graft.classic

/** Classic pgsql-output style file (reference: default.style:1-40,
  * parser src/taginfo.cpp): 4 columns `OsmType Tag DataType Flags`.
  * Flags: polygon | linear | nocolumn | phstore | delete | nocache.
  */
final case class StyleEntry(
    osmTypes: Set[String], // node / way
    tag: String,
    dataType: String,
    flags: Set[String]) {
  def isDelete: Boolean = flags.contains("delete")
  def isPolygon: Boolean = flags.contains("polygon") || flags.contains("phstore")
  def makesColumn: Boolean =
    !flags.contains("nocolumn") && !flags.contains("phstore") && !isDelete
  /** column_type() (src/taginfo-impl.hpp:38-50): INT/REAL when the
    * declared type is a known alias, TEXT otherwise. way_area never
    * gets a type flag — the database string is produced directly
    * (read_style_file's special case, src/taginfo.cpp:141-145). */
  def columnType: String =
    if (tag == "way_area") "text"
    else if (StyleFile.IntTypes(dataType)) "int"
    else if (StyleFile.RealTypes(dataType)) "real"
    else "text"
}

final case class Style(entries: Seq[StyleEntry]) {
  def exportKeys(osmType: String): Seq[String] =
    entries.filter(e => !e.isDelete && e.osmTypes.contains(osmType)).map(_.tag)
  def polygonKeys: Seq[String] = entries.filter(_.isPolygon).map(_.tag)
  def deleteKeys: Seq[String] = entries.filter(_.isDelete).map(_.tag)
  def columnKeys: Seq[String] =
    entries.filter(_.makesColumn).map(_.tag).distinct
  /** read_style_file's return value: a `way_area … delete`-only line
    * disables the computed way_area column (src/taginfo.cpp:156-158;
    * the flag set must be exactly {delete}). */
  def enableWayArea: Boolean =
    !entries.exists(e => e.tag == "way_area" && e.flags == Set("delete"))
}

object StyleFile {

  private val KnownFlags =
    Set("polygon", "linear", "nocache", "nocolumn", "delete", "phstore")
  private[classic] val IntTypes =
    Set("smallint", "integer", "bigint", "int2", "int4", "int8")
  private[classic] val RealTypes = Set("real", "double precision")

  /** parse_tag_flags (src/taginfo.cpp:41-67, pinned by the
    * reference's own tests/test-taginfo.cpp): flags split on commas
    * and newlines with NO trimming (so "polygon, nocache" drops the
    * " nocache" token as unknown), unknown flags warn and are
    * ignored, never error. */
  private[graft] def parseTagFlags(flags: String,
      lineno: Int): Set[String] = {
    val fs0 = if (flags.isEmpty) Set.empty[String]
      else flags.split("[,\r\n]").toSet.filter(_.nonEmpty)
    fs0.filterNot(KnownFlags).foreach(f => System.err.println(
      s"[graft] Unknown flag '$f' line $lineno, ignored"))
    fs0.filter(KnownFlags)
  }

  /** Parser matching read_style_file (src/taginfo.cpp:92-199) exactly:
    * comments/blank lines skipped, `OsmType Tag DataType [Flags]`,
    * unknown flags WARN and are ignored (parse_tag_flags), unknown
    * DATA types are lenient (get_tag_type → text), osm types match by
    * substring and a line matching neither node nor way is a "Weird
    * style line" error, wildcards are allowed only when the augmented
    * flag set is exactly {delete}, and a file with zero valid columns
    * is the reference's "Unable to parse" error. */
  def parse(text: String, filename: String = "style"): Style = {
    val entries = text.linesIterator.zipWithIndex
      .map { case (l, i) =>
        (l.indexOf('#') match { // trailing comments allowed
          case -1 => l.trim
          case j  => l.substring(0, j).trim
        }, i + 1)
      }
      .filter(_._1.nonEmpty)
      .map { case (line, lineno) =>
        def mk(types: String, tag: String, dataType: String,
            flags: String): StyleEntry = {
          val fs = parseTagFlags(flags, lineno)
          // wildcards only on pure delete rules: the check runs AFTER
          // the int/real type flag is added, so a typed wildcard line
          // is rejected too (src/taginfo.cpp:148-154)
          val augmented =
            if (tag != "way_area" && (IntTypes(dataType) || RealTypes(dataType)))
              fs + "__typed" else fs
          if (augmented != Set("delete") &&
              (tag.contains('?') || tag.contains('*')))
            throw new IllegalArgumentException(
              s"Wildcard '$tag' in non-delete style entry.")
          // osm types match by SUBSTRING (strstr); neither → error
          val ts = Set("node", "way").filter(types.contains(_))
          if (ts.isEmpty)
            throw new IllegalArgumentException(
              s"Weird style line $filename:$lineno.")
          StyleEntry(ts, tag, dataType, fs)
        }
        // sscanf("%23s %63s %23s %127s") reads the first FOUR tokens
        // and silently ignores any trailing fields, so 5+ fields are
        // accepted (osm2pgsql taginfo/openstreetmap.style carries
        // comments past column 4); fewer than 3 is the error case.
        line.split("\\s+").take(4) match {
          case Array(types, tag, dataType, flags) =>
            mk(types, tag, dataType, flags)
          case Array(types, tag, dataType) =>
            mk(types, tag, dataType, "")
          case fields => throw new IllegalArgumentException(
            s"Error reading style file line $lineno (fields=${fields.length}).")
        }
      }.toSeq
    if (entries.isEmpty)
      throw new IllegalArgumentException(
        "Unable to parse any valid columns from the style file. Aborting.")
    Style(entries)
  }

  /** The shipped default.style's rule set (the full key inventory of
    * default.style, required to reproduce the reference's regression
    * counts on real extracts). z_order/way_area are computed columns,
    * not tag matches, and are omitted here. */
  val defaultStyle: Style = parse("""
    |node,way  access       text  linear
    |node,way  addr:housename      text  linear
    |node,way  addr:housenumber    text  linear
    |node,way  addr:interpolation  text  linear
    |node,way  admin_level  text  linear
    |node,way  aerialway    text  linear
    |node,way  aeroway      text  polygon
    |node,way  amenity      text  polygon
    |node,way  area         text  polygon
    |node,way  barrier      text  linear
    |node,way  bicycle      text  linear
    |node,way  brand        text  linear
    |node,way  bridge       text  linear
    |node,way  boundary     text  linear
    |node,way  building     text  polygon
    |node      capital      text  linear
    |node,way  construction text  linear
    |node,way  covered      text  linear
    |node,way  culvert      text  linear
    |node,way  cutting      text  linear
    |node,way  denomination text  linear
    |node,way  disused      text  linear
    |node      ele          text  linear
    |node,way  embankment   text  linear
    |node,way  foot         text  linear
    |node,way  generator:source  text  linear
    |node,way  harbour      text  polygon
    |node,way  highway      text  linear
    |node,way  historic     text  polygon
    |node,way  horse        text  linear
    |node,way  intermittent text  linear
    |node,way  junction     text  linear
    |node,way  landuse      text  polygon
    |node,way  layer        text  linear
    |node,way  leisure      text  polygon
    |node,way  lock         text  linear
    |node,way  man_made     text  polygon
    |node,way  military     text  polygon
    |node,way  motorcar     text  linear
    |node,way  name         text  linear
    |node,way  natural      text  polygon
    |node,way  office       text  polygon
    |node,way  oneway       text  linear
    |node,way  operator     text  linear
    |node,way  place        text  polygon
    |node,way  population   text  linear
    |node,way  power        text  polygon
    |node,way  power_source text  linear
    |node,way  public_transport  text  polygon
    |node,way  railway      text  linear
    |node,way  ref          text  linear
    |node,way  religion     text  linear
    |node,way  route        text  linear
    |node,way  service      text  linear
    |node,way  shop         text  polygon
    |node,way  sport        text  polygon
    |node,way  surface      text  linear
    |node,way  toll         text  linear
    |node,way  tourism      text  polygon
    |node,way  tower:type   text  linear
    |way       tracktype    text  linear
    |node,way  tunnel       text  linear
    |node,way  water        text  polygon
    |node,way  waterway     text  polygon
    |node,way  wetland      text  polygon
    |node,way  width        text  linear
    |node,way  wood         text  linear
    |way       abandoned:aeroway   text  polygon,nocolumn
    |way       abandoned:amenity   text  polygon,nocolumn
    |way       abandoned:building  text  polygon,nocolumn
    |way       abandoned:landuse   text  polygon,nocolumn
    |way       abandoned:power     text  polygon,nocolumn
    |way       area:highway        text  polygon,nocolumn
    |node,way  note         text  delete
    |node,way  note:*       text  delete
    |node,way  source       text  delete
    |node,way  source_ref   text  delete
    |node,way  source:*     text  delete
    |node,way  attribution  text  delete
    |node,way  comment      text  delete
    |node,way  fixme        text  delete
    |node,way  created_by   text  delete
    |node,way  odbl         text  delete
    |node,way  odbl:note    text  delete
    |node,way  SK53_bulk:load  text  delete
    |node,way  tiger:*      text  delete
    |node,way  NHD:*        text  delete
    |node,way  nhd:*        text  delete
    |node,way  gnis:*       text  delete
    |node,way  geobase:*    text  delete
    |node,way  accuracy:meters  text  delete
    |node,way  sub_sea:type text  delete
    |node,way  waterway:type  text  delete
    |node,way  KSJ2:*       text  delete
    |node,way  yh:*         text  delete
    |node,way  osak:*       text  delete
    |node,way  kms:*        text  delete
    |node,way  ngbe:*       text  delete
    |node,way  naptan:*     text  delete
    |node,way  CLC:*        text  delete
    |node,way  3dshapes:ggmodelk  text  delete
    |node,way  AND_nosr_r   text  delete
    |node,way  import       text  delete
    |node,way  it:fvg:*     text  delete
    |""".stripMargin)
}
