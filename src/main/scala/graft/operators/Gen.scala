package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.geom._

/** Generalization engine operators (reference: src/gen/ —
  * osm2pgsql-gen's strategies, which the reference mostly pushes down
  * to PostGIS SQL). Here each strategy is a Spark plan.
  */
object Gen {

  /** Typed geometry-collect aggregate: gathers group members into a
    * multi-geometry (the grouping half of the reference's per-tile
    * `ST_Union` dissolve, src/gen/gen-tile-vector.cpp:41-60; the
    * boolean-overlay dissolve itself is future work — collected parts
    * are exact and render identically when styles don't rely on
    * dissolved borders). Input/output: EWKB binary. */
  object CollectGeomAgg extends Aggregator[Array[Byte], List[Array[Byte]], Array[Byte]] {
    def zero: List[Array[Byte]] = Nil
    def reduce(b: List[Array[Byte]], a: Array[Byte]): List[Array[Byte]] =
      if (a == null) b else a :: b
    def merge(a: List[Array[Byte]], b: List[Array[Byte]]): List[Array[Byte]] =
      a ::: b
    def finish(r: List[Array[Byte]]): Array[Byte] = {
      // deterministic member order regardless of shuffle arrival
      val geoms = r.map(Ewkb.decode)
        .sortBy(g => Ewkb.encodeHex(g))
      val polys = geoms.collect { case p: Polygon => p }
      if (polys.nonEmpty && polys.size == geoms.size)
        Ewkb.encode(MultiPolygon(polys.toVector, polys.head.srid))
      else if (geoms.nonEmpty)
        Ewkb.encode(GeometryCollection(geoms.toVector, geoms.head.srid))
      else null
    }
    def bufferEncoder: Encoder[List[Array[Byte]]] =
      Encoders.javaSerialization[List[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def stCollectAgg(geom: Column): Column =
    udaf(CollectGeomAgg).apply(geom)

  /** True boolean dissolve: the collected polygons are merged with
    * [[graft.geom.PolyUnion]] (segment arrangement + coverage
    * classification) — the native form of the reference's pushed-down
    * `ST_Union` (src/gen/gen-tile-vector.cpp:41-60). Non-polygonal
    * members are ignored. */
  object UnionGeomAgg extends Aggregator[Array[Byte], List[Array[Byte]], Array[Byte]] {
    def zero: List[Array[Byte]] = Nil
    def reduce(b: List[Array[Byte]], a: Array[Byte]): List[Array[Byte]] =
      if (a == null) b else a :: b
    def merge(a: List[Array[Byte]], b: List[Array[Byte]]): List[Array[Byte]] =
      a ::: b
    def finish(r: List[Array[Byte]]): Array[Byte] = {
      val polys = r.map(Ewkb.decode).sortBy(g => Ewkb.encodeHex(g)).flatMap {
        case p: Polygon          => Seq(p)
        case MultiPolygon(ps, _) => ps
        case _                   => Seq.empty
      }
      if (polys.isEmpty) null
      else Ewkb.encode(PolyUnion.union(polys))
    }
    def bufferEncoder: Encoder[List[Array[Byte]]] =
      Encoders.javaSerialization[List[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def stUnionAgg(geom: Column): Column =
    udaf(UnionGeomAgg).apply(geom)

  case class GenRow(x: Long, y: Long, param: String, geom: Array[Byte],
      area: Double)

  /** The vector-union strategy end-to-end
    * (src/gen/gen-tile-vector.cpp:38-75): per (tile, group),
    * buffer(+b) each polygon → union → buffer(-2b) → buffer(+b) →
    * dump parts. The buffer sandwich is a morphological close (gaps
    * smaller than 2b merge; the final +b restores scale). Same Spark
    * shape as [[RasterGen.rasterUnion]]: envelope-binned to tiles,
    * one local group computation per (tile, param). */
  def vectorUnion(df: DataFrame, geomCol: String, paramCol: Option[String],
      zoom: Int, margin: Double = 0.0, bufferSize: Double = 10.0,
      circleSegs: Int = 16): DataFrame = {
    import RasterGen.{Binned, GenTile, tilesForBox}
    implicit val binnedEnc: Encoder[Binned] = Encoders.product[Binned]
    implicit val rowEnc: Encoder[GenRow] = Encoders.product[GenRow]
    implicit val keyEnc: Encoder[(Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)

    def polysOf(g: Geometry): Seq[Polygon] = g match {
      case p: Polygon          => Seq(p)
      case MultiPolygon(ps, _) => ps
      case _                   => Seq.empty
    }

    val tilesUdf = udf((ewkb: Array[Byte]) =>
      if (ewkb == null) Seq.empty[(Long, Long)]
      else Box.of(Ewkb.decode(ewkb)).toSeq
        .flatMap(b => tilesForBox(b, zoom, margin)))
    val withParam = paramCol match {
      case Some(c) => df.select(col(geomCol).as("g"), col(c).cast("string").as("p"))
      case None    => df.select(col(geomCol).as("g"), lit("").as("p"))
    }
    withParam
      .select(explode(tilesUdf(col("g"))).as("t"), col("p"), col("g"))
      .select(col("t._1").as("x"), col("t._2").as("y"),
        col("p").as("param"), col("g").as("ewkb"))
      .as[Binned]
      .groupByKey(b => (b.x, b.y, b.param))
      .flatMapGroups { (k: (Long, Long, String), rows: Iterator[Binned]) =>
        val (tx, ty, param) = k
        val polys = rows.flatMap(r => polysOf(Ewkb.decode(r.ewkb))).toSeq
        if (polys.isEmpty) Iterator.empty
        else {
          val buffered = polys.flatMap(p =>
            polysOf(Offset.buffer(p, bufferSize, circleSegs)))
          val merged = PolyUnion.union(buffered)
          val closed = Offset.buffer(
            Offset.buffer(merged, -2 * bufferSize, circleSegs),
            bufferSize, circleSegs)
          polysOf(closed).iterator.map { poly =>
            GenRow(tx, ty, param, Ewkb.encode(poly),
              math.abs(GeomOps.area(poly)))
          }
        }
      }
      .toDF()
  }

  /** Discrete isolation (src/gen/gen-discrete-isolation.cpp:60-151):
    * for each point, distance to the nearest point with strictly higher
    * importance — the label-ranking metric. The reference scans all
    * points sorted by importance with a grid; here: a grid-binned
    * self-join over neighboring cells, then min distance over candidate
    * pairs restricted to higher importance. Points with no
    * higher-importance point in the 3x3 neighborhood get isolation
    * `cellSize` (a lower bound, like the reference's cutoff). */
  def discreteIsolation(points: DataFrame, idCol: String, xCol: String,
      yCol: String, importanceCol: String, cellSize: Double): DataFrame = {
    val base = points.select(
      col(idCol).as("pid"), col(xCol).as("px"), col(yCol).as("py"),
      col(importanceCol).as("imp"),
      floor(col(xCol) / cellSize).cast("long").as("cx"),
      floor(col(yCol) / cellSize).cast("long").as("cy"))
    // candidates live in the 3x3 neighborhood: explode this side's cell
    // into its 9 neighbors so the join is a plain equi-join on cells
    val neighbors = base.select(
      col("pid").as("nid"), col("px").as("nx"), col("py").as("ny"),
      col("imp").as("nimp"),
      explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy")))): _*))
        .as("cell"))
      .select(col("nid"), col("nx"), col("ny"), col("nimp"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val pairs = base.join(neighbors, Seq("cx", "cy"))
      .where(col("nimp") > col("imp") ||
        (col("nimp") === col("imp") && col("nid") < col("pid")))
      // explicit multiply, not pow(x,2): bit-identical cross-engine
      .select(col("pid"),
        sqrt((col("px") - col("nx")) * (col("px") - col("nx")) +
          (col("py") - col("ny")) * (col("py") - col("ny"))).as("d"))
    base.select(col("pid"), col("px"), col("py"), col("imp"))
      .join(pairs.groupBy(col("pid")).agg(min(col("d")).as("isolation")),
        Seq("pid"), "left")
      .withColumn("isolation", coalesce(col("isolation"), lit(cellSize)))
  }

  /** River-width aggregation (SQL at src/gen/gen-rivers.cpp:202-233):
    * per way: sum(len·width)/total length over segments — a plain
    * weighted average once the spatial join produced segments. */
  def riverWidths(segments: DataFrame, wayIdCol: String, lenCol: String,
      widthCol: String): DataFrame =
    segments.groupBy(col(wayIdCol))
      .agg((sum(col(lenCol) * col(widthCol)) / sum(col(lenCol)))
        .as("avg_width"), sum(col(lenCol)).as("total_len"))

  /** [[riverWidths]] with cross-engine-exact arithmetic (decimal sums
    * via [[graft.queries.Exact]], one final double division) — the
    * oracle-checked form. */
  def riverWidthsExact(segments: DataFrame, wayIdCol: String,
      lenCol: String, widthCol: String, scale: Int = 6): DataFrame = {
    import graft.queries.Exact
    segments.groupBy(col(wayIdCol))
      .agg(
        (Exact.dsumProd(col(lenCol), col(widthCol), scale) /
          Exact.dsum(col(lenCol))).as("avg_width"),
        Exact.dsum(col(lenCol)).as("total_len"))
  }

  /** tile-sql strategy (src/gen/gen-tile-sql.cpp:1-47): run a SQL
    * template once per tile with {x}/{y}/{zoom} substituted, union the
    * results. Tiles come as (zoom, x, y) rows; templates should
    * reference registered temp views. */
  def runTileSql(spark: SparkSession, tiles: Seq[(Int, Long, Long)],
      sqlTemplate: String): DataFrame =
    tiles.map { case (z, x, y) =>
      spark.sql(sqlTemplate
        .replace("{zoom}", z.toString)
        .replace("{x}", x.toString)
        .replace("{y}", y.toString))
    }.reduce(_ unionByName _)
}
