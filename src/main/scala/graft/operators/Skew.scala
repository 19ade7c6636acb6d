package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators: salted join and two-phase (salted)
  * aggregation.
  *
  * At 100 TB a handful of hot keys (a viral document cluster, a
  * default/sentinel id, a mega-relation) can pin an entire
  * shuffle-join or aggregation on one reducer. Both operators here
  * split each hot key across `salts` reducers and reconcile exactly:
  * results are bit-identical to the unsalted plan, which is what the
  * oracle gate checks.
  *
  * AQE's runtime skew-join handling covers sort-merge joins when
  * statistics surface the skew; explicit salting remains the tool for
  * aggregations, for broadcast-ineligible dimension joins, and for
  * plans where the skew is known ahead of time (OSM's mega-ways,
  * dedup's viral clusters) — the same reason the reference shards its
  * pending-way queue across worker clones (src/osmdata.cpp:202-367).
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a dimension side.
    *
    * The fact side gets a deterministic per-row salt in [0, salts);
    * the dimension side is replicated `salts` times; the join key
    * becomes (key, salt), so one hot key spreads over `salts`
    * reducers. Row-content salting (xxhash64 of the whole fact row)
    * keeps the salt stable across retries and cluster sizes. Output =
    * exactly the rows of `fact ⋈ dim` (salt column dropped).
    *
    * @param fact     large, possibly skewed side (columns must be
    *                 xxhash64-hashable — no MapType)
    * @param dim      smaller side (too big or too dynamic to
    *                 broadcast, else you'd just broadcast it)
    * @param keys     equi-join key column names (present both sides)
    * @param salts    fan-out per key
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(lit((0 until salts).toArray)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted sum/count aggregation: partial aggregate on
    * (keys, salt), then final aggregate on keys. Exact for the
    * algebraic aggregates taken here (sum, count) — the classic
    * hot-key group-by fix when map-side combine alone can't absorb
    * the skew (e.g. high-cardinality pre-projection or re-aggregation
    * after a join).
    *
    * @param df       input
    * @param keys     group-by keys
    * @param sumCols  (inputColumn -> outputName) sums
    * @param countAs  output name for the row count
    * @param salts    fan-out per key
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      sumCols: Seq[(Column, String)], countAs: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(sumCols.nonEmpty, "at least one sum column required")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(sumCols.head._1).as("__s0"),
        (sumCols.tail.map(_._1).zipWithIndex
          .map { case (c, i) => sum(c).as(s"__s${i + 1}") } :+
          count(lit(1)).as("__cnt")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__s0")).as(sumCols.head._2),
        (sumCols.tail.zipWithIndex.map { case ((_, n), i) =>
          sum(col(s"__s${i + 1}")).as(n)
        } :+ sum(col("__cnt")).as(countAs)): _*)
  }
}
