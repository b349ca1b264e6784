package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** All random-hyperplane LSH band buckets of a vector in ONE pass.
  *
  * Replaces the per-plane `aggregate(zip_with(vec, g_p, _*_), 0.0, _+_)`
  * columns (reference analog: ZOrderingIndexHelper-style per-column
  * passes): those scan the embedding array once per plane through
  * interpreted lambdas — 16 array traversals per row at the default
  * plane count. Here every plane's dot product accumulates in the same
  * strict index order (so each dot is bit-identical to the left-fold
  * form and the DuckDB oracles keep matching) but all planes advance
  * together in a single fused traversal inside whole-stage codegen.
  *
  * Output: `array<string>` of `bands` bucket keys; bucket b is the
  * concatenated '0'/'1' signs of planes [b·bpb, (b+1)·bpb). A null
  * vector, null element, or length ≠ `dims` yields ALL-ZERO buckets —
  * exactly what the lambda form produced (`when(null > 0, 1)
  * .otherwise(0)` = 0 for every plane).
  *
  * `compsT` is the transposed plane matrix: compsT(i·planes + p) =
  * component i of hyperplane p — transposed so the inner per-element
  * loop walks memory sequentially.
  */
case class LshBandBuckets(
    child: Expression, compsT: Seq[Double],
    planes: Int, bands: Int, dims: Int) extends UnaryExpression {

  require(planes % bands == 0, "planes must divide evenly into bands")
  require(compsT.length == planes * dims, "compsT must be planes x dims")

  private def bpb: Int = planes / bands

  @transient private lazy val compsArr: Array[Double] = compsT.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorMath.elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "lsh_band_buckets argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val acc = new Array[Double](planes)
    var ok = v != null
    if (ok) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != dims) ok = false
      else {
        var i = 0
        while (ok && i < n) {
          if (a.isNullAt(i)) ok = false
          else {
            val x = VectorMath.readElem(child.dataType, a, i)
            val base = i * planes
            var p = 0
            while (p < planes) { acc(p) += x * compsArr(base + p); p += 1 }
            i += 1
          }
        }
      }
    }
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val bytes = new Array[Byte](bpb)
      var r = 0
      while (r < bpb) {
        bytes(r) = if (ok && acc(b * bpb + r) > 0) '1'.toByte else '0'.toByte
        r += 1
      }
      out(b) = UTF8String.fromBytes(bytes)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val comps = ctx.addReferenceObj("lshCompsT", compsArr, "double[]")
    val a = ctx.freshName("lshA")
    val n = ctx.freshName("lshN")
    val i = ctx.freshName("lshI")
    val p = ctx.freshName("lshP")
    val b = ctx.freshName("lshB")
    val r = ctx.freshName("lshR")
    val x = ctx.freshName("lshX")
    val acc = ctx.freshName("lshAcc")
    val ok = ctx.freshName("lshOk")
    val out = ctx.freshName("lshOut")
    val bytes = ctx.freshName("lshBytes")
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        double[] $acc = new double[$planes];
        boolean $ok = !${c.isNull};
        if ($ok) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
          int $n = $a.numElements();
          if ($n != $dims) {
            $ok = false;
          } else {
            for (int $i = 0; $ok && $i < $n; $i++) {
              if ($a.isNullAt($i)) { $ok = false; break; }
              double $x = ${VectorMath.getter(child.dataType, a, i)};
              for (int $p = 0; $p < $planes; $p++) {
                $acc[$p] += $x * $comps[$i * $planes + $p];
              }
            }
          }
        }
        org.apache.spark.unsafe.types.UTF8String[] $out =
          new org.apache.spark.unsafe.types.UTF8String[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          byte[] $bytes = new byte[$bpb];
          for (int $r = 0; $r < $bpb; $r++) {
            $bytes[$r] = (byte) (($ok && $acc[$b * $bpb + $r] > 0) ? '1' : '0');
          }
          $out[$b] = org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes);
        }
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $out);
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
