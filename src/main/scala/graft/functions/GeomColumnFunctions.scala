package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate-array geometry expressions over parallel x/y array
  * columns — the codegen-friendly core of the geometry function family
  * (reference: src/geom-functions.cpp). The full typed geometry ADT +
  * EWKB codec lives in [[graft.geom]]; these column forms exist so hot
  * per-row geometry math (area, length, bbox, centroid) runs inside
  * WholeStageCodegen with no UDF/serialization boundary.
  */
object GeomColumnFunctions {

  /** Twice the signed shoelace area of the ring given by parallel
    * coordinate arrays (ring closure implied). Integer-typed inputs give
    * exact, engine-portable results (src/geom-functions.cpp:351-366
    * computes the same sum in double). */
  def shoelaceArea2x(xs: Column, ys: Column): Column = {
    val n = size(xs)
    abs(aggregate(
      transform(sequence(lit(1), n), i =>
        element_at(xs, i) * element_at(ys, (i % n) + 1) -
          element_at(xs, (i % n) + 1) * element_at(ys, i)),
      lit(0L), _ + _))
  }

  /** SQL mirror of [[shoelaceArea2x]] over list columns `xs`/`ys`. */
  def shoelaceArea2xSql(xs: String, ys: String): String =
    s"abs(list_sum(list_transform(range(1, len($xs) + 1), i -> " +
      s"$xs[i] * $ys[(i % len($xs)) + 1] - $xs[(i % len($xs)) + 1] * $ys[i])))"

  /** Twice the SIGNED shoelace area (no abs — the centroid formula needs
    * the sign). Elements are cast to long before multiplying so integer
    * inputs can't overflow 32 bits. */
  def shoelaceSigned2x(xs: Column, ys: Column): Column = {
    val n = size(xs)
    val xl = (i: Column) => element_at(xs, i).cast("long")
    val yl = (i: Column) => element_at(ys, i).cast("long")
    aggregate(
      transform(sequence(lit(1), n), i =>
        xl(i) * yl((i % n) + 1) - xl((i % n) + 1) * yl(i)),
      lit(0L), _ + _)
  }

  /** SQL mirror of [[shoelaceSigned2x]]. */
  def shoelaceSigned2xSql(xs: String, ys: String): String = {
    def x(i: String) = s"CAST($xs[$i] AS BIGINT)"
    def y(i: String) = s"CAST($ys[$i] AS BIGINT)"
    s"list_sum(list_transform(range(1, len($xs) + 1), i -> " +
      s"${x("i")} * ${y(s"(i % len($xs)) + 1")} - " +
      s"${x(s"(i % len($xs)) + 1")} * ${y("i")}))"
  }

  /** 6× the signed-area-weighted centroid-x numerator:
    * Σ (x_i + x_{i+1})(x_i·y_{i+1} − x_{i+1}·y_i). Centroid x =
    * this / (3 · signed 2A) — exact integer numerator & denominator
    * for integer rings, so the final division is the only float op
    * (src/geom-functions.cpp:812-837 computes the same form in double).
    * The y numerator is −centroidNum6x(ys, xs): swapping the axes
    * negates the cross product, so negate the result back.
    */
  def centroidNum6x(xs: Column, ys: Column): Column = {
    val n = size(xs)
    val xl = (i: Column) => element_at(xs, i).cast("long")
    val yl = (i: Column) => element_at(ys, i).cast("long")
    aggregate(
      transform(sequence(lit(1), n), i => {
        val nxt = (i % n) + 1
        (xl(i) + xl(nxt)) * (xl(i) * yl(nxt) - xl(nxt) * yl(i))
      }),
      lit(0L), _ + _)
  }

  /** SQL mirror of [[centroidNum6x]] (swap xs/ys and negate for the y
    * numerator). */
  def centroidNum6xSql(xs: String, ys: String): String = {
    def x(i: String) = s"CAST($xs[$i] AS BIGINT)"
    def y(i: String) = s"CAST($ys[$i] AS BIGINT)"
    val nxt = s"(i % len($xs)) + 1"
    s"list_sum(list_transform(range(1, len($xs) + 1), i -> " +
      s"(${x("i")} + ${x(nxt)}) * " +
      s"(${x("i")} * ${y(nxt)} - ${x(nxt)} * ${y("i")})))"
  }

  /** Planar length of the polyline given by parallel coordinate arrays:
    * sum of segment euclidean distances (src/geom-functions.cpp:439-455).
    * sqrt/multiply/add on identical doubles are IEEE-exact, and the fold
    * is sequential, so this is cross-engine deterministic. */
  def planarLength(xs: Column, ys: Column): Column =
    aggregate(
      transform(sequence(lit(1), size(xs) - 1), i => {
        val dx = (element_at(xs, i + 1) - element_at(xs, i)).cast("double")
        val dy = (element_at(ys, i + 1) - element_at(ys, i)).cast("double")
        sqrt(dx * dx + dy * dy)
      }),
      lit(0.0), _ + _)

  /** SQL mirror of [[planarLength]]. */
  def planarLengthSql(xs: String, ys: String): String =
    s"list_sum(list_transform(range(1, len($xs)), i -> " +
      s"sqrt(CAST(($xs[i+1] - $xs[i]) * ($xs[i+1] - $xs[i]) AS DOUBLE) + " +
      s"CAST(($ys[i+1] - $ys[i]) * ($ys[i+1] - $ys[i]) AS DOUBLE))))"
}
