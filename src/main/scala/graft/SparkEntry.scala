package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator's query entry; `oracleSql` holds
  * the DuckDB-equivalent SQL for the hash-compare gate. Sub-registries
  * live under [[graft.queries]] so each operator family is testable on
  * its own.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Pipeline2.queries ++
      graft.queries.Pipeline3.queries ++
      graft.queries.Pipeline4.queries ++
      graft.queries.Pipeline5.queries ++
      graft.queries.Pipeline6.queries ++
      graft.queries.Pipeline7.queries ++
      graft.queries.Pipeline8.queries ++
      graft.queries.Pipeline9.queries ++
      graft.queries.Pipeline10.queries ++
      graft.queries.Pipeline11.queries ++
      graft.queries.Pipeline12.queries ++
      graft.queries.Pipeline13.queries ++
      graft.queries.OsmAnalog.queries ++
      graft.queries.GenQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Pipeline.oracles ++
      graft.queries.Pipeline2.oracles ++
      graft.queries.Pipeline3.oracles ++
      graft.queries.Pipeline4.oracles ++
      graft.queries.Pipeline5.oracles ++
      graft.queries.Pipeline6.oracles ++
      graft.queries.Pipeline7.oracles ++
      graft.queries.Pipeline8.oracles ++
      graft.queries.Pipeline9.oracles ++
      graft.queries.Pipeline10.oracles ++
      graft.queries.Pipeline11.oracles ++
      graft.queries.Pipeline12.oracles ++
      graft.queries.Pipeline13.oracles ++
      graft.queries.OsmAnalog.oracles ++
      graft.queries.GenQueries.oracles
}
