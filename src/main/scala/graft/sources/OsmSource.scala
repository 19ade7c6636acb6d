package graft.sources

import org.apache.spark.sql.SparkSession

/** Format auto-detection + dispatch over the three OSM file readers
  * (reference: src/input.cpp:307-336 prepares input files and detects
  * format from extension/content; osmium sniffs magic bytes).
  *
  * Detection is content-based (first bytes, through gzip):
  *  - 0xFF 0xE0 → o5m/o5c (reset + header datasets)
  *  - 4-byte big-endian BlobHeader length then protobuf field 1
  *    (0x0A) → pbf
  *  - leading '<' (after whitespace/BOM) → xml/osc
  */
object OsmSource {

  def sniff(head: Array[Byte]): String = {
    val isGz = head.length >= 2 && (head(0) & 0xff) == 0x1f &&
      (head(1) & 0xff) == 0x8b
    val isBz2 = head.length >= 3 && head(0) == 'B' && head(1) == 'Z' &&
      head(2) == 'h'
    // decompress only the first few bytes — `head` may be a truncated
    // prefix of a larger file, so EOF mid-stream is expected
    val buf =
      if (isGz || isBz2)
        try {
          val in =
            if (isGz) new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(head))
            else {
              val codec = new org.apache.hadoop.io.compress.BZip2Codec()
              codec.setConf(new org.apache.hadoop.conf.Configuration(false))
              codec.createInputStream(new java.io.ByteArrayInputStream(head))
            }
          try in.readNBytes(16) finally in.close()
        } catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
      else head
    if (buf.length >= 2 && (buf(0) & 0xff) == 0xff && (buf(1) & 0xff) == 0xe0)
      "o5m"
    else if (buf.length >= 5 && buf(0) == 0 && (buf(4) & 0xff) == 0x0a)
      "pbf"
    else {
      val i = buf.indexWhere(b => !Character.isWhitespace(b.toChar))
      val j = // skip a UTF-8 BOM if present
        if (buf.length >= 3 && (buf(0) & 0xff) == 0xef) 3 else math.max(i, 0)
      if (buf.length > j && buf(j) == '<') "xml"
      else throw new IllegalArgumentException(
        "cannot detect OSM file format from content")
    }
  }

  private def headOf(path: String): Array[Byte] = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try in.readNBytes(1024) finally in.close()
  }

  /** Read any mix of .osm/.osc[.gz], .o5m/.o5c[.gz], .pbf files into
    * one set of entity frames (formats grouped, results unioned). */
  def read(spark: SparkSession, paths: Seq[String]): OsmXml.OsmDataFrames = {
    val byFormat = paths.groupBy(p => sniff(headOf(p)))
    val parts = byFormat.toSeq.sortBy(_._1).map {
      case ("xml", ps) => OsmXml.read(spark, ps)
      case ("o5m", ps) => O5m.readMaybeGz(spark, ps)
      case ("pbf", ps) =>
        // pbf carries no change sections; normalize to action=create so
        // the frames union with the xml/o5m readers' shape
        ps.map { p =>
          val dfs = OsmPbf.read(spark, p)
          def withAction(df: org.apache.spark.sql.DataFrame) = {
            val cols = org.apache.spark.sql.functions.lit("create")
              .as("action") +: df.columns.map(df.col).toSeq
            df.select(cols: _*)
          }
          OsmXml.OsmDataFrames(withAction(dfs.nodes), withAction(dfs.ways),
            withAction(dfs.relations))
        }.reduce(union)
      case (other, _) =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
    parts.reduce(union)
  }

  private def union(a: OsmXml.OsmDataFrames,
      b: OsmXml.OsmDataFrames): OsmXml.OsmDataFrames =
    OsmXml.OsmDataFrames(
      a.nodes.unionByName(b.nodes),
      a.ways.unionByName(b.ways),
      a.relations.unionByName(b.relations))
}
