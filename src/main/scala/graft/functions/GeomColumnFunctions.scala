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
