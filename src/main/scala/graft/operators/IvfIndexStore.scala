package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Persisted IVF index — the vector-side sibling of
  * [[BandIndexStore]]: a production similarity-search pipeline trains
  * the coarse quantizer once, assigns the corpus once, and then
  * serves probe batches against the stored cells without ever
  * re-scanning the corpus. [[Similarity.ivfTopK]] is the in-plan
  * form; this persists its two artifacts:
  *   - `path/centroids` — the capped deterministic centroid sample
  *     (id % centroidEvery == 0, lowest `centroidCap` ids), quantized
  *     vectors + norms, ≤ centroidCap rows;
  *   - `path/cells/cell=K/` — every corpus vector (id, quantized
  *     vector, norm) under its argmax-cosine cell, one directory per
  *     Voronoi cell.
  *
  * Probe cost is the point: a batch of Q queries ranks cells against
  * the broadcast centroids, and the scan of `path/cells` is
  * PARTITION-PRUNED to the ≤ Q·nprobe probed cell directories — at
  * 100 TB of vectors the probe reads ~nprobe/|C| of the index, and
  * the pruned-cell list is a bounded driver collect (≤ Q·nprobe ids,
  * same justified-bounded class as the ANN broadcast probe set).
  * Scores are the same quantized integer cosine as every ANN operator
  * here, so probe(write(corpus)) is bit-equal to the in-plan
  * [[Similarity.ivfTopK]] with the same parameters (spec'd). */
object IvfIndexStore {

  private val qcos = (v: Column, n1: Column, v2: Column, n2: Column) =>
    qdot(v, v2).cast("double") / (n1 * n2)

  /** Train (deterministic sample) + assign + store. One corpus pass:
    * the assignment argmax is map-side combinable (one compact row
    * per vector before the shuffle), then one hash-partitioned write
    * by cell. */
  def write(corpus: DataFrame, path: String,
      centroidEvery: Int = 25, centroidCap: Int = 256): Unit = {
    require(corpus.isEmpty ||
      !corpus.where(col("id") % centroidEvery === 0).isEmpty,
      s"IVF centroid sample is empty (no id % $centroidEvery == 0 rows)")
    val cent = broadcast(corpus
      .where(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), quantize(col("vec")).as("cv"))
      .orderBy(col("cid")).limit(centroidCap)
      .withColumn("cn", sqrt(qdot(col("cv"), col("cv")).cast("double"))))
    val corp = corpus.select(col("id").as("nid"),
        quantize(col("vec")).as("nv"))
      .withColumn("nn", sqrt(qdot(col("nv"), col("nv")).cast("double")))
    // argmax-by-struct, like ivfTopK: collapses the |corpus|×|C|
    // broadcast expansion to one row per vector before any shuffle
    val assigned = corp.crossJoin(cent)
      .select(col("nid"), col("nv"), col("nn"),
        struct(qcos(col("nv"), col("nn"), col("cv"), col("cn")).as("c"),
          (-col("cid")).as("nc")).as("sc"))
      .groupBy(col("nid"))
      .agg(first(col("nv")).as("nv"), first(col("nn")).as("nn"),
        max(col("sc")).as("m"))
      .select(col("nid"), col("nv"), col("nn"),
        (-col("m.nc")).as("cell"))
    assigned
      .repartition(col("cell"))
      .sortWithinPartitions("cell", "nid")
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$path/cells")
    cent.select(col("cid"), col("cv"), col("cn"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Serve a probe batch: rank the broadcast centroids per query,
    * read ONLY the probed cell partitions, exact quantized cosine
    * within them, top-k with deterministic tie-breaks. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val cent = broadcast(spark.read.parquet(s"$path/centroids"))
    val q = broadcast(queries.select(col("id").as("qid"),
        quantize(col("vec")).as("qv"))
      .withColumn("qn", sqrt(qdot(col("qv"), col("qv")).cast("double"))))
    val pw = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid").asc)
    val probes = q.crossJoin(cent)
      .select(col("qid"), col("qv"), col("qn"), col("cid"),
        qcos(col("qv"), col("qn"), col("cv"), col("cn")).as("pcos"))
      .withColumn("prank", row_number().over(pw))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    // bounded driver list (≤ |queries| · nprobe): the literal IN
    // filter is what turns the cells read into partition pruning —
    // only the probed cell=K directories are listed and scanned
    val probedCells = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0))
    val cells = spark.read.parquet(s"$path/cells")
      .where(col("cell").cast("long").isInCollection(probedCells))
      .select(col("nid"), col("nv"), col("nn"),
        col("cell").cast("long").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    probes.join(cells, probes("cid") === cells("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        qcos(col("qv"), col("qn"), col("nv"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
