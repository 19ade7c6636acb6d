package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `Array[Float]` embedding columns.
  *
  * Two families:
  *  - double-precision ops (`dot`, `norm`, `cosine`) — the production
  *    path: sequential left-fold via `aggregate`, stays in codegen, no
  *    UDF, no driver state;
  *  - quantized integer ops (`quantize`, `qdot`) — exact long arithmetic
  *    used by the oracle-checked queries, because integer math is
  *    bit-identical across engines while float summation order is not.
  *
  * At 100 TB scale these are all per-row projections (no shuffle); the
  * expensive part of similarity search is the candidate generation, see
  * [[graft.operators.Similarity]].
  */
object VectorFunctions {

  /** Dot product in double: zip_with multiply + sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantize to long at `scale` (default 1e-3 resolution). Float→double
    * widening is exact; round is half-away-from-zero on both engines. */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  /** Exact dot product of two already-quantized long arrays. */
  def qdot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, _ * _), lit(0L), _ + _)

  /** Cosine over quantized vectors: exact integer dot/norms, one final
    * double division — deterministic cross-engine. */
  def qcosine(qa: Column, qb: Column): Column =
    qdot(qa, qb).cast("double") /
      (sqrt(qdot(qa, qa).cast("double")) * sqrt(qdot(qb, qb).cast("double")))
}
