package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Whole-stage-codegen'd vector kernels for the similarity/ANN family.
  *
  * Semantics are BIT-IDENTICAL to the higher-order-function forms they
  * replace (`aggregate(zip_with(a, b, (x, y) => x.cast(double) *
  * y.cast(double)), 0.0, _ + _)`): every element promotes to IEEE
  * double, products accumulate strictly left-to-right, a null element or
  * length mismatch yields null — so the DuckDB oracles keep hashing
  * equal while the interpreter-heavy lambda evaluation (the dominant
  * cost of the banded embedding paths at bench scale) becomes one tight
  * fused loop. */
object VectorMath {

  private[functions] def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Java accessor snippet for element `i` of `arr`, promoted to double. */
  private[functions] def getter(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case _                       => s"$arr.getDouble($i)"
    }

  private[functions] def readElem(dt: DataType, arr: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case _                       => arr.getDouble(i)
    }
}

/** Σᵢ (double)a[i] · (double)b[i], left-to-right. */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorMath.elemOk(left.dataType) && VectorMath.elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dot_product arguments must be ARRAY<FLOAT> or ARRAY<DOUBLE>")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VectorMath.readElem(left.dataType, a, i) *
        VectorMath.readElem(right.dataType, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val a = ctx.freshName("dpA")
    val b = ctx.freshName("dpB")
    val n = ctx.freshName("dpN")
    val i = ctx.freshName("dpI")
    val acc = ctx.freshName("dpAcc")
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${l.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${r.value};
          int $n = $a.numElements();
          if ($n != $b.numElements()) {
            ${ev.isNull} = true;
          } else {
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
              $acc += ${VectorMath.getter(left.dataType, a, i)} *
                ${VectorMath.getter(right.dataType, b, i)};
            }
            ${ev.value} = $acc;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ (double)a[i]², left-to-right (the squared L2 norm). */
case class SumSquaresD(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorMath.elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sum_squares arguments must be ARRAY<FLOAT> or ARRAY<DOUBLE>")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = VectorMath.readElem(child.dataType, a, i)
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val a = ctx.freshName("ssA")
    val n = ctx.freshName("ssN")
    val i = ctx.freshName("ssI")
    val acc = ctx.freshName("ssAcc")
    val x = ctx.freshName("ssX")
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = ${VectorMath.getter(child.dataType, a, i)};
            $acc += $x * $x;
          }
          ${ev.value} = $acc;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
