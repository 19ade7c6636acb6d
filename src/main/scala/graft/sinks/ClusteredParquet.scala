package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TileFunctions

/** Cluster-on-write (reference: CLUSTER output tables by geometry,
  * flex_table_t::cluster_by_geom src/flex-table.hpp:77-99, executed in
  * table_connection_t::stop): co-locate spatially-near rows so range
  * scans touch few blocks.
  *
  * Spark form: range-partition + sort within partitions by a
  * space-filling-curve key (quadkey interleave = Z-order) before the
  * write — parquet row groups then carry tight lon/lat min/max stats
  * and spatial filters prune at the row-group level, which is exactly
  * what CLUSTER buys PostGIS. At 100 TB this also keeps spatially local
  * data on the same executors for downstream tile jobs.
  */
object ClusteredParquet {

  val DefaultZoom = 16

  def withSfcKey(df: DataFrame, lonCol: String, latCol: String,
      zoom: Int = DefaultZoom): DataFrame =
    df.withColumn("__sfc", TileFunctions.quadkey(
      TileFunctions.tileX(col(lonCol), zoom),
      TileFunctions.tileY(col(latCol), zoom), zoom))

  /** Spatially clustered write: repartitionByRange on the SFC key (so
    * files = contiguous curve ranges), sortWithinPartitions (so row
    * groups are tight), drop the key. `cluster = false` ({cluster='no'},
    * nocluster.feature) writes unordered — same rows, no sort cost,
    * no row-group locality. */
  def write(df: DataFrame, path: String, lonCol: String, latCol: String,
      numFiles: Int, zoom: Int = DefaultZoom,
      cluster: Boolean = true): Unit =
    if (cluster)
      withSfcKey(df, lonCol, latCol, zoom)
        .repartitionByRange(numFiles, col("__sfc"))
        .sortWithinPartitions(col("__sfc"))
        .drop("__sfc")
        .write.mode("overwrite").parquet(path)
    else
      df.repartition(numFiles).write.mode("overwrite").parquet(path)
}
