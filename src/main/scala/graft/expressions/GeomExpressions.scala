package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.{Ewkb, GeomOps}

/** Native Catalyst expressions for the geometry hot path — one rung
  * above the UDFs in [[graft.functions.GeomUdfs]]: no
  * Scala-function-call serialization boundary, null handling inlined
  * by Catalyst, and (for the pure-math ops) real generated code.
  *
  * Registered by [[GraftExtensions]] (spark.sql.extensions) or
  * [[GeomExpressions.register]] on an existing session.
  */

/** quadkey(x, y, zoom): bit-interleave tile coordinates —
  * fully codegen'd: the generated Java is a constant-bounded loop of
  * shifts, fused into whole-stage codegen (reference: src/tile.hpp:
  * 90-112 quadkey interleave). */
case class TileQuadkey(x: Expression, y: Expression, zoom: Expression)
    extends TernaryExpression {
  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = zoom
  override def dataType: DataType = LongType

  override def nullSafeEval(xv: Any, yv: Any, zv: Any): Any = {
    val xl = xv.asInstanceOf[Long]; val yl = yv.asInstanceOf[Long]
    val z = zv.asInstanceOf[Int]
    var q = 0L
    var i = 0
    while (i < z) {
      q |= ((xl >> i) & 1L) << (2 * i)
      q |= ((yl >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    q
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv, zv) => {
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      s"""
         |long $q = 0L;
         |for (int $i = 0; $i < $zv; $i++) {
         |  $q |= (($xv >> $i) & 1L) << (2 * $i);
         |  $q |= (($yv >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $q;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(x = newFirst, y = newSecond, zoom = newThird)
}

/** st_area_n(ewkb): planar area over the EWKB payload. Decode +
  * compute in eval (CodegenFallback — the decode dominates; promoting
  * to generated code buys nothing until the payload itself is
  * columnar). */
case class StAreaExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    GeomOps.area(Ewkb.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** st_length_n(ewkb): planar length. */
case class StLengthExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    GeomOps.length(Ewkb.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** st_geometry_type_n(ewkb). */
case class StGeometryTypeExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Ewkb.decode(v.asInstanceOf[Array[Byte]]).typeName)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** One-pass ring metrics over parallel int coordinate arrays. */
object GeomKernels {
  /** (signed 2A, 6·centroid-x numerator, 6·centroid-y numerator) of the
    * ring given by parallel int arrays (closure implied). Exact long
    * arithmetic — the one-pass native form of
    * [[graft.functions.GeomColumnFunctions.shoelaceSigned2x]] +
    * [[graft.functions.GeomColumnFunctions.centroidNum6x]] (three
    * interpreted `aggregate` HOFs otherwise). */
  def ringMetrics(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      ys: org.apache.spark.sql.catalyst.util.ArrayData,
      longElems: Boolean): InternalRow = {
    val n = math.min(xs.numElements(), ys.numElements())
    var a2 = 0L
    var cx6 = 0L
    var cy6 = 0L
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val xi = if (longElems) xs.getLong(i) else xs.getInt(i).toLong
      val yi = if (longElems) ys.getLong(i) else ys.getInt(i).toLong
      val xj = if (longElems) xs.getLong(j) else xs.getInt(j).toLong
      val yj = if (longElems) ys.getLong(j) else ys.getInt(j).toLong
      val cross = xi * yj - xj * yi
      a2 += cross
      cx6 += (xi + xj) * cross
      cy6 += (yi + yj) * cross
      i += 1
    }
    InternalRow(a2, cx6, cy6)
  }
}

/** ring_metrics(xs, ys) → struct(a2x, cx6, cy6), exact longs. Accepts
  * array<int> or array<long> coordinates (element accessor picked from
  * the input type — getInt on a long array would silently misread). */
case class RingMetricsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }
  override def dataType: DataType = StructType(Seq(
    StructField("a2x", LongType, nullable = false),
    StructField("cx6", LongType, nullable = false),
    StructField("cy6", LongType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any =
    GeomKernels.ringMetrics(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      longElems)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.GeomKernels.ringMetrics($a, $b, $longElems)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object GeomExpressions {

  // Spark 4 moved Column to sql-api; the classic bridge converts
  // Column <-> catalyst Expression
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def quadkey(x: Column, y: Column, zoom: Column): Column =
    column(TileQuadkey(expression(x), expression(y), expression(zoom)))
  def stAreaN(g: Column): Column = column(StAreaExpr(expression(g)))
  def stLengthN(g: Column): Column = column(StLengthExpr(expression(g)))
  def stGeometryTypeN(g: Column): Column =
    column(StGeometryTypeExpr(expression(g)))
  def ringMetricsN(xs: Column, ys: Column): Column =
    column(RingMetricsExpr(expression(xs), expression(ys)))

  /** Register into an existing session's function registry (SQL-side
    * surface without restarting with extensions). */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("tile_quadkey",
      es => TileQuadkey(es(0), es(1), es(2)), "built-in")
    r.createOrReplaceTempFunction("st_area_n",
      es => StAreaExpr(es.head), "built-in")
    r.createOrReplaceTempFunction("st_length_n",
      es => StLengthExpr(es.head), "built-in")
    r.createOrReplaceTempFunction("st_geometry_type_n",
      es => StGeometryTypeExpr(es.head), "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.expressions.GraftExtensions`:
  * injects the native geometry functions at session build
  * (src/flex-lua-geom.cpp's registration moment, Spark-style). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("tile_quadkey"),
      new ExpressionInfo(classOf[TileQuadkey].getName, "tile_quadkey"),
      (es: Seq[Expression]) => TileQuadkey(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("st_area_n"),
      new ExpressionInfo(classOf[StAreaExpr].getName, "st_area_n"),
      (es: Seq[Expression]) => StAreaExpr(es.head)))
    e.injectFunction((FunctionIdentifier("st_length_n"),
      new ExpressionInfo(classOf[StLengthExpr].getName, "st_length_n"),
      (es: Seq[Expression]) => StLengthExpr(es.head)))
    e.injectFunction((FunctionIdentifier("st_geometry_type_n"),
      new ExpressionInfo(classOf[StGeometryTypeExpr].getName,
        "st_geometry_type_n"),
      (es: Seq[Expression]) => StGeometryTypeExpr(es.head)))
  }
}
