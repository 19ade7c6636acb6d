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

  def parse(text: String): Style = Style(
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        line.split("\\s+") match {
          case Array(types, tag, dataType, flags) =>
            Some(StyleEntry(types.split(",").toSet, tag, dataType,
              flags.split(",").toSet))
          case Array(types, tag, dataType) =>
            Some(StyleEntry(types.split(",").toSet, tag, dataType, Set.empty))
          case _ => None
        }
      }.toSeq)

  /** The subset of the shipped default.style needed for the classic
    * 4-table pipeline (re-typed from default.style, not copied
    * verbatim). */
  val defaultStyle: Style = parse("""
    |node,way  access       text  linear
    |node,way  addr:housename text linear
    |node,way  aerialway    text  linear
    |node,way  aeroway      text  polygon
    |node,way  amenity      text  polygon
    |node,way  area         text  nocolumn
    |node,way  barrier      text  linear
    |node,way  boundary     text  linear
    |node,way  building     text  polygon
    |way       bridge       text  linear
    |node,way  highway      text  linear
    |node,way  historic     text  polygon
    |node,way  landuse      text  polygon
    |node,way  layer        text  linear
    |node,way  leisure      text  polygon
    |node,way  man_made     text  polygon
    |node,way  military     text  polygon
    |node,way  name         text  linear
    |node,way  natural      text  polygon
    |node,way  place        text  polygon
    |node,way  power        text  polygon
    |node,way  railway      text  linear
    |node,way  ref          text  linear
    |node,way  shop         text  polygon
    |node,way  sport        text  polygon
    |node,way  tourism      text  polygon
    |way       tunnel       text  linear
    |node,way  water        text  polygon
    |node,way  waterway     text  polygon
    |node,way  created_by   text  delete
    |node,way  source       text  delete
    |""".stripMargin)
}
