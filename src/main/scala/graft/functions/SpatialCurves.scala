package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve kernels for multi-column layout optimization
  * (reference analog: optimize/ZOrderingUtil.java:23 byte interleave and
  * optimize/HilbertCurveUtils.java:29). Pure static functions so Catalyst
  * codegen can call them via the object's static forwarders. */
object SpatialCurves {

  /** MSB-first round-robin interleave of the low `bits` bits of each
    * value. With k inputs the result occupies k*bits ≤ 63 bits, so
    * lexicographic long order == curve order. */
  def interleave(vals: Array[Long], bits: Int): Long = {
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < vals.length) {
        out = (out << 1) | ((vals(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** Distance along the 2-D Hilbert curve of order `order` for cell
    * (x, y); classic rotate-and-accumulate formulation. */
  def hilbert2D(xIn: Long, yIn: Long, order: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate quadrant
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Register `z_value` / `hilbert_value` in the session's function
    * registry so they are callable from SQL and `expr(...)` (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("z_value", exprs => ZValue(exprs), "scala_udf")
    reg.createOrReplaceTempFunction("hilbert_value",
      { exprs =>
        require(exprs.size == 2, "hilbert_value takes exactly 2 arguments")
        HilbertValue(exprs.head, exprs(1))
      }, "scala_udf")
  }
}

/** `z_value(r1, r2, ...)`: interleave the bits of k long-typed cell ranks
  * into one Z-address. Deterministic, codegen'd, null ⇒ rank 0 (nulls
  * cluster first — same cell as the minimum). */
case class ZValue(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty, "z_value needs at least one column")

  private def bits: Int = math.min(16, 63 / children.size)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("z_value arguments must be BIGINT")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      arr(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    SpatialCurves.interleave(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    val code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        long[] $arr = new long[${children.size}];
        $fills
        long ${ev.value} = graft.functions.SpatialCurves.interleave($arr, $bits);
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `hilbert_value(rx, ry)`: distance along the order-31 2-D Hilbert curve
  * for long-typed cell ranks. Better locality than Z-order at the cost of
  * 2-D only (reference baseline: Hilbert skips 0.855 vs Z 0.80). */
case class HilbertValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("hilbert_value arguments must be BIGINT")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    SpatialCurves.hilbert2D(
      if (l == null) 0L else l.asInstanceOf[Long],
      if (r == null) 0L else r.asInstanceOf[Long],
      31)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val code =
      code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = graft.functions.SpatialCurves.hilbert2D(
          ${l.isNull} ? 0L : ${l.value}, ${r.isNull} ? 0L : ${r.value}, 31);
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
