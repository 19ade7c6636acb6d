package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `Array[Float]` embedding columns.
  *
  * Two families:
  *  - double-precision ops (`dot`, `norm`, `cosine`) — the production
  *    path;
  *  - quantized integer ops (`quantize`, `qdot`) — exact long arithmetic
  *    used by the oracle-checked queries, because integer math is
  *    bit-identical across engines while float summation order is not.
  *
  * All are backed by the codegen'd kernels in
  * [[graft.expressions.VectorExpressions]] (a straight Java loop over
  * ArrayData) rather than `aggregate(zip_with(...))`, whose
  * higher-order functions are CodegenFallback — interpreted and
  * allocating an intermediate array per call, which dominates when a
  * kernel runs once per candidate *pair* rather than once per row.
  *
  * At 100 TB scale these are all per-row projections (no shuffle); the
  * expensive part of similarity search is the candidate generation, see
  * [[graft.operators.Similarity]].
  */
object VectorFunctions {
  import graft.expressions.VectorExpressions._

  /** Dot product in double: codegen'd sequential loop (same fold order
    * as the zip_with formulation). */
  def dot(a: Column, b: Column): Column =
    ddotN(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantize to long at `scale` (default 1e-3 resolution). Float→double
    * widening is exact; rounding is Spark `round`'s exact BigDecimal
    * HALF_UP rule, which DuckDB's round matches. */
  def quantize(a: Column, scale: Int = 1000): Column = quantizeN(a, scale)

  /** Exact dot product of two already-quantized long arrays. */
  def qdot(qa: Column, qb: Column): Column = qdotN(qa, qb)

  /** Cosine over quantized vectors: exact integer dot/norms, one final
    * double division — deterministic cross-engine. */
  def qcosine(qa: Column, qb: Column): Column =
    qdot(qa, qb).cast("double") /
      (sqrt(qdot(qa, qa).cast("double")) * sqrt(qdot(qb, qb).cast("double")))

  /** Symmetric per-vector int8 quantization (the embedding-store
    * compression everyone ships at scale: 4× smaller than float32,
    * SIMD-friendly dot products): scale = max|x| / 127, q_i =
    * round(x_i / scale). All-zero vectors quantize to zeros. The
    * arithmetic is float→double widening (exact) + one multiply/divide
    * + round — bit-deterministic cross-engine. Returns array<long>
    * with values in [-127, 127]. */
  def int8Quantize(a: Column): Column = {
    val d = a.cast("array<double>")
    val mx = array_max(transform(d, x => abs(x)))
    when(mx === 0d, transform(d, _ => lit(0L)))
      .otherwise(transform(d, x => round(x * lit(127d) / mx).cast("long")))
  }
}
