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
}

final case class Style(entries: Seq[StyleEntry]) {
  def exportKeys(osmType: String): Seq[String] =
    entries.filter(e => !e.isDelete && e.osmTypes.contains(osmType)).map(_.tag)
  def polygonKeys: Seq[String] = entries.filter(_.isPolygon).map(_.tag)
  def deleteKeys: Seq[String] = entries.filter(_.isDelete).map(_.tag)
  def columnKeys: Seq[String] =
    entries.filter(_.makesColumn).map(_.tag).distinct
}

object StyleFile {

  private val KnownTypes = Set("node", "way")
  private val KnownFlags =
    Set("polygon", "linear", "nocache", "nocolumn", "delete", "phstore")

  /** Strict parser matching src/taginfo.cpp: comments/blank lines
    * skipped, everything else must be `OsmType Tag DataType [Flags]`
    * with known osm types and flags — malformed input is an ERROR,
    * not silently dropped (tests/style/invalid-*.style are rejection
    * fixtures upstream). */
  def parse(text: String): Style = Style(
    text.linesIterator
      .map(l => l.indexOf('#') match { // trailing comments allowed
        case -1 => l.trim
        case i  => l.substring(0, i).trim
      })
      .filter(_.nonEmpty)
      .map { line =>
        def mk(types: String, tag: String, dataType: String,
            flags: String): StyleEntry = {
          val ts = types.split(",").toSet
          val fs = if (flags.isEmpty) Set.empty[String]
            else flags.split(",").toSet
          ts.find(!KnownTypes.contains(_)).foreach(t =>
            throw new IllegalArgumentException(
              s"Unknown type in style file: '$t'."))
          fs.find(!KnownFlags.contains(_)).foreach(f =>
            throw new IllegalArgumentException(
              s"Unknown flag in style file line: '$f'."))
          // wildcards only make sense on delete rules
          // (src/taginfo.cpp:149-156); unknown DATA types are lenient
          // (get_tag_type → text), matching the reference
          if (!fs.contains("delete") &&
              (tag.contains('?') || tag.contains('*')))
            throw new IllegalArgumentException(
              s"Wildcard '$tag' in non-delete style entry.")
          StyleEntry(ts, tag, dataType, fs)
        }
        line.split("\\s+") match {
          case Array(types, tag, dataType, flags) =>
            mk(types, tag, dataType, flags)
          case Array(types, tag, dataType) =>
            mk(types, tag, dataType, "")
          case _ => throw new IllegalArgumentException(
            s"Error in style file line: '$line'.")
        }
      }.toSeq)

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
