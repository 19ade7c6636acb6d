package graft.geom

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** EWKB codec — the reference's wire format for geometry values
  * (reference: src/wkb.cpp:573-582 `geom_to_ewkb`/`ewkb_to_geom`):
  * little-endian WKB with the PostGIS SRID extension (type flag
  * 0x20000000 + 4-byte SRID), plus the `ensure_multi` wrap used for
  * `multi*`-typed columns (src/wkb.cpp:197-307).
  *
  * The binary form is what GeometryUDT stores in DataFrames, so parquet
  * files written by this engine are directly loadable into PostGIS.
  */
object Ewkb {

  private val SridFlag = 0x20000000

  private object T {
    val Point = 1; val LineString = 2; val Polygon = 3
    val MultiPoint = 4; val MultiLineString = 5; val MultiPolygon = 6
    val Collection = 7
  }

  // ---------- encode ----------

  def encode(g: Geometry, ensureMulti: Boolean = false): Array[Byte] = {
    if (g.isNull) return Array.emptyByteArray // test-wkb.cpp: nullgeom
    val out = ArrayBuffer.empty[Byte]
    writeGeom(out, if (ensureMulti) wrapMulti(g) else g, withSrid = true)
    out.toArray
  }

  def encodeHex(g: Geometry, ensureMulti: Boolean = false): String =
    encode(g, ensureMulti).map("%02X".format(_)).mkString

  private def wrapMulti(g: Geometry): Geometry = g match {
    case p: Point      => MultiPoint(Vector(p), p.srid)
    case l: LineString => MultiLineString(Vector(l), l.srid)
    case p: Polygon    => MultiPolygon(Vector(p), p.srid)
    case other         => other
  }

  private def writeGeom(out: ArrayBuffer[Byte], g: Geometry,
      withSrid: Boolean): Unit = {
    val buf = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte) // little-endian marker
    val code = g match {
      case _: Point              => T.Point
      case _: LineString         => T.LineString
      case _: Polygon            => T.Polygon
      case _: MultiPoint         => T.MultiPoint
      case _: MultiLineString    => T.MultiLineString
      case _: MultiPolygon       => T.MultiPolygon
      case _: GeometryCollection => T.Collection
      case _: NullGeom =>
        throw new IllegalArgumentException("cannot encode null geometry")
    }
    buf.putInt(if (withSrid) code | SridFlag else code)
    if (withSrid) {
      val b2 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b2.putInt(g.srid)
      out ++= buf.array()
      out ++= b2.array()
    } else out ++= buf.array()
    g match {
      case Point(p, _)       => writePt(out, p)
      case LineString(ps, _) => writePts(out, ps)
      case Polygon(o, is, _) =>
        writeInt(out, 1 + is.size)
        writePts(out, o.pts)
        is.foreach(r => writePts(out, r.pts))
      case MultiPoint(ps, _) =>
        writeInt(out, ps.size); ps.foreach(writeGeom(out, _, withSrid = false))
      case MultiLineString(ls, _) =>
        writeInt(out, ls.size); ls.foreach(writeGeom(out, _, withSrid = false))
      case MultiPolygon(ps, _) =>
        writeInt(out, ps.size); ps.foreach(writeGeom(out, _, withSrid = false))
      case GeometryCollection(gs, _) =>
        writeInt(out, gs.size); gs.foreach(writeGeom(out, _, withSrid = false))
      case _: NullGeom => ()
    }
  }

  private def writeInt(out: ArrayBuffer[Byte], v: Int): Unit = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(v); out ++= b.array()
  }

  private def writePt(out: ArrayBuffer[Byte], p: Pt): Unit = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(p.x); b.putDouble(p.y); out ++= b.array()
  }

  private def writePts(out: ArrayBuffer[Byte], ps: Vector[Pt]): Unit = {
    writeInt(out, ps.size); ps.foreach(writePt(out, _))
  }

  // ---------- decode ----------

  def decode(bytes: Array[Byte]): Geometry = {
    if (bytes.isEmpty) return NullGeom() // round-trip of the null geometry
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf, defaultSrid = Srid.WGS84)
  }

  /** SRID from the EWKB header alone (byte order + typed flags +
    * optional SRID word) — no geometry decode. Returns the default
    * (4326) when the SRID flag is absent, like [[decode]]. */
  def peekSrid(bytes: Array[Byte]): Int = {
    val buf = ByteBuffer.wrap(bytes)
    val bo = buf.get()
    buf.order(if (bo == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt()
    if ((rawType & SridFlag) != 0) buf.getInt() else Srid.WGS84
  }

  def decodeHex(hex: String): Geometry = {
    val bytes = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    decode(bytes)
  }

  private def readGeom(buf: ByteBuffer, defaultSrid: Int): Geometry = {
    val bo = buf.get()
    buf.order(if (bo == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt()
    val srid = if ((rawType & SridFlag) != 0) buf.getInt() else defaultSrid
    (rawType & 0xff) match {
      case T.Point      => Point(readPt(buf), srid)
      case T.LineString => LineString(readPts(buf), srid)
      case T.Polygon =>
        val n = buf.getInt()
        val rings = Vector.fill(n)(Ring(readPts(buf)))
        Polygon(rings.head, rings.tail, srid)
      case T.MultiPoint =>
        MultiPoint(Vector.fill(buf.getInt()) {
          readGeom(buf, srid).asInstanceOf[Point]
        }, srid)
      case T.MultiLineString =>
        MultiLineString(Vector.fill(buf.getInt()) {
          readGeom(buf, srid).asInstanceOf[LineString]
        }, srid)
      case T.MultiPolygon =>
        MultiPolygon(Vector.fill(buf.getInt()) {
          readGeom(buf, srid).asInstanceOf[Polygon]
        }, srid)
      case T.Collection =>
        GeometryCollection(Vector.fill(buf.getInt()) {
          readGeom(buf, srid)
        }, srid)
      case t =>
        throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  private def readPt(buf: ByteBuffer): Pt = Pt(buf.getDouble(), buf.getDouble())

  private def readPts(buf: ByteBuffer): Vector[Pt] =
    Vector.fill(buf.getInt())(readPt(buf))
}
