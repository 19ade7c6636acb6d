package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tile/quadkey math (reference: src/tile.hpp:20-112, src/tile.cpp).
  *
  * Pure integer/double column expressions — no UDFs — mirroring the
  * reference's lon/lat↔tile conversions and quadkey interleave. The
  * Web-Mercator forms use the closed-form spherical formulas
  * (src/reprojection.cpp:54-79).
  */
object TileFunctions {

  /** EARTH_CIRCUMFERENCE in meters (src/tile.hpp:23). */
  val EarthCircumference: Double = 40075016.68

  /** Tile X at `zoom` from longitude in degrees. */
  def tileX(lon: Column, zoom: Int): Column =
    floor((lon + 180.0) / 360.0 * (1L << zoom)).cast("long")

  /** Web-Mercator tile Y at `zoom` from latitude in degrees
    * (y grows southward, OSM convention). */
  def tileY(lat: Column, zoom: Int): Column = {
    val latRad = radians(lat)
    floor((lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / math.Pi)
      / 2.0 * (1L << zoom)).cast("long")
  }

  /** Linear (plate-carrée) tile Y — used by the oracle-checked queries
    * because transcendental functions are not bit-stable across engines;
    * the Mercator form above is the production path. */
  def tileYLinear(lat: Column, zoom: Int): Column =
    floor((lit(85.0) - lat) / 170.0 * (1L << zoom)).cast("long")

  /** Quadkey: interleave x/y tile bits, 2 bits per zoom level
    * (src/tile.hpp:90-112). Digit i (from LSB) = x_bit(i) + 2*y_bit(i),
    * packed base-4. Expressed as a `zoom`-term integer sum so the same
    * expression runs on any SQL engine.
    */
  def quadkey(x: Column, y: Column, zoom: Int): Column =
    (0 until zoom).map { i =>
      (shiftright(x, i) % 2 + (shiftright(y, i) % 2) * 2) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** Parent tile coordinate at a lower (column-valued) zoom. Spark's
    * shiftright needs a literal shift, so use exact floor division by a
    * power of two — identical to >> for the non-negative coords here
    * (tile coords < 2^zoom ≪ 2^53, so the double math is exact). */
  def zoomOut(xy: Column, fromZoom: Int, toZoom: Column): Column =
    floor(xy / pow(lit(2.0), lit(fromZoom) - toZoom)).cast("long")

  /** SQL fragment mirroring [[quadkey]] (DuckDB/ANSI: >> and %). */
  def quadkeySql(x: String, y: String, zoom: Int): String =
    (0 until zoom).map { i =>
      s"((($x >> $i) % 2) + (($y >> $i) % 2) * 2) * ${1L << (2 * i)}"
    }.mkString(" + ")
}
