package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Floating-point SUM is order-dependent; Spark's shuffle order and
  * DuckDB's scan order differ, so a double sum would hash-mismatch.
  * Summing through an exact DECIMAL is associative/commutative, so both
  * engines produce the identical value; the final cast back to DOUBLE of
  * that identical decimal is deterministic on both sides.
  *
  * Pattern (must be mirrored verbatim in the oracle SQL):
  *   Spark:  sum(col.cast(DecimalType(p, s))).cast("double")
  *   DuckDB: CAST(SUM(CAST(col AS DECIMAL(p, s))) AS DOUBLE)
  */
object Exact {
  /** Exact decimal sum surfaced as double; `scale` decimal digits kept. */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Exact decimal average surfaced as double (sum/count in double at the
    * end — both operands identical cross-engine, so the quotient is too).
    */
  def davg(c: Column, precision: Int = 18, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(precision, scale))).cast("double") /
      count(c).cast("double"))

  /** Exact sum of a product: both factors are cast to decimal BEFORE the
    * multiply, so the arithmetic is exact decimal on both engines. Casting
    * a double *product* to decimal is NOT cross-engine stable (the two
    * engines round the binary expansion differently at the last digit);
    * casting the raw stored factors is, because stored test values are
    * short decimals nowhere near a rounding tie.
    */
  def dsumProd(a: Column, b: Column, scale: Int = 6): Column =
    sum(a.cast(DecimalType(18, scale)) * b.cast(DecimalType(18, scale)))
      // Re-round the exact sum to scale 4 before surfacing as double: a
      // decimal→double cast at scale 12 is 1-ulp unstable cross-engine
      // (int128/10^12 double-rounds); at scale 4 the numerator fits in
      // 2^53 so the conversion is a single correctly-rounded division.
      // Products of 2-decimal inputs have ≤4 decimals, so no tie exists.
      .cast(DecimalType(28, 4)).cast("double")

  /** SQL fragment mirroring [[dsumProd]]. */
  def dsumProdSql(a: String, b: String, scale: Int = 6): String =
    s"CAST(CAST(SUM(CAST(($a) AS DECIMAL(18,$scale)) * CAST(($b) AS DECIMAL(18,$scale))) AS DECIMAL(28,4)) AS DOUBLE)"

  /** SQL fragment mirroring [[dsum]]. */
  def dsumSql(expr: String, precision: Int = 18, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL($precision,$scale))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def davgSql(expr: String, precision: Int = 18, scale: Int = 4): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL($precision,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"
}
