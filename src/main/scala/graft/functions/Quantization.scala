package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd quantization kernels for the SQ8/PQ ANN paths.
  *
  * These replace the higher-order-function encode/decode columns
  * (`transform(sequence(...), i => aggregate(...))`): interpreted
  * lambdas cost ~m·ksub·dsub closure invocations per row for PQ encode
  * — the dominant cost of the quantized scans at bench scale. Each
  * kernel is one fused loop with arithmetic BIT-IDENTICAL to the lambda
  * form it replaces (same left-to-right double folds, same
  * first-minimum tie-break, same clamp-after-floor), so the DuckDB
  * oracles keep hash-matching.
  *
  * Null semantics: a null input array, a wrongly-sized array, a null
  * element, or an out-of-range code yields a null result (the lambda
  * forms null-poisoned elements on such inputs; no caller feeds them —
  * embedding columns are fixed-dims and non-null — and a whole-row null
  * is the safer contract). */
object Quantization {

  /** Read a full float/double array as doubles; null if any element is
    * null or the length differs from `expect`. */
  def readVec(dt: DataType, a: ArrayData, expect: Int): Array[Double] = {
    val n = a.numElements()
    if (n != expect) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = VectorMath.readElem(dt, a, i)
      i += 1
    }
    out
  }

  /** Per subspace: index of the L2-nearest codebook entry, strict-<
    * comparison so the FIRST minimum wins (= `array_position(dists,
    * array_min(dists))` of the lambda form). */
  def pqEncode(dt: DataType, a: ArrayData, cb: Array[Double],
      m: Int, ksub: Int, dsub: Int): Array[Int] = {
    val v = readVec(dt, a, m * dsub)
    if (v == null) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var d = 0.0
        val vBase = s * dsub
        val cBase = (s * ksub + j) * dsub
        var i = 0
        while (i < dsub) {
          val diff = v(vBase + i) - cb(cBase + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    codes
  }

  def pqDecode(codes: ArrayData, cb: Array[Double],
      m: Int, ksub: Int, dsub: Int): Array[Double] = {
    if (codes.numElements() != m) return null
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      System.arraycopy(cb, (s * ksub + c) * dsub, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  /** Per dim: `clamp(floor((x - lo) * 255 / (hi - lo)))`, clamp AFTER
    * the floor, constant dims (hi = lo) encode 0 — op order matches the
    * lambda form exactly. */
  def sq8Encode(dt: DataType, a: ArrayData, lo: Array[Double],
      hi: Array[Double]): Array[Int] = {
    val v = readVec(dt, a, lo.length)
    if (v == null) return null
    val out = new Array[Int](v.length)
    var i = 0
    while (i < v.length) {
      out(i) =
        if (hi(i) == lo(i)) 0
        else {
          var c = math.floor((v(i) - lo(i)) * 255.0 / (hi(i) - lo(i))).toInt
          if (c < 0) c = 0
          if (c > 255) c = 255
          c
        }
      i += 1
    }
    out
  }

  /** Midpoint decode `lo + (code + 0.5) * (hi - lo) / 256` (constant
    * dims decode to lo). */
  def sq8Decode(codes: ArrayData, lo: Array[Double],
      hi: Array[Double]): Array[Double] = {
    if (codes.numElements() != lo.length) return null
    val out = new Array[Double](lo.length)
    var i = 0
    while (i < lo.length) {
      if (codes.isNullAt(i)) return null
      out(i) =
        if (hi(i) == lo(i)) lo(i)
        else lo(i) + (codes.getInt(i) + 0.5) * (hi(i) - lo(i)) / 256.0
      i += 1
    }
    out
  }
}

/** Base for the quantization kernels: each subclass supplies ONE Java
  * call expression (returning `double[]`/`int[]` or null); per-element
  * work stays in the static kernels above, inside whole-stage codegen
  * spans. */
abstract class QuantKernel extends UnaryExpression {
  override def nullable: Boolean = true

  /** A single Java expression computing the kernel result (array or
    * null) from the evaluated child variable. */
  protected def genCall(ctx: CodegenContext, childVar: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val raw = ctx.freshName("qkRaw")
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          Object $raw = ${genCall(ctx, c.value.toString)};
          if ($raw == null) { ${ev.isNull} = true; }
          else {
            ${ev.value} =
              org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($raw);
          }
        }
      """
    ev.copy(code = code)
  }
}

/** PQ encode — see [[Quantization.pqEncode]]. `flatCb(s·ksub·dsub +
  * j·dsub + i)` = dim i of centroid j of subspace s. */
case class PqEncodeExpr(
    child: Expression, flatCb: Seq[Double],
    m: Int, ksub: Int, dsub: Int) extends QuantKernel {

  require(flatCb.length == m * ksub * dsub, "flatCb must be m*ksub*dsub")
  @transient private lazy val cbArr: Array[Double] = flatCb.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorMath.elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_encode argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val out = Quantization.pqEncode(
      child.dataType, v.asInstanceOf[ArrayData], cbArr, m, ksub, dsub)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def genCall(ctx: CodegenContext, childVar: String): String = {
    val cb = ctx.addReferenceObj("pqCb", cbArr, "double[]")
    val dt = ctx.addReferenceObj("pqDt", child.dataType,
      "org.apache.spark.sql.types.DataType")
    s"graft.functions.Quantization.pqEncode($dt, $childVar, $cb, $m, $ksub, $dsub)"
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ decode — codes back to concatenated centroid blocks. */
case class PqDecodeExpr(
    child: Expression, flatCb: Seq[Double],
    m: Int, ksub: Int, dsub: Int) extends QuantKernel {

  require(flatCb.length == m * ksub * dsub, "flatCb must be m*ksub*dsub")
  @transient private lazy val cbArr: Array[Double] = flatCb.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("pq_decode takes ARRAY<INT>")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val out = Quantization.pqDecode(
      v.asInstanceOf[ArrayData], cbArr, m, ksub, dsub)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def genCall(ctx: CodegenContext, childVar: String): String = {
    val cb = ctx.addReferenceObj("pqCb", cbArr, "double[]")
    s"graft.functions.Quantization.pqDecode($childVar, $cb, $m, $ksub, $dsub)"
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQ8 encode — see [[Quantization.sq8Encode]]. */
case class Sq8EncodeExpr(
    child: Expression, lo: Seq[Double], hi: Seq[Double]) extends QuantKernel {

  require(lo.length == hi.length, "lo/hi must agree")
  @transient private lazy val loArr: Array[Double] = lo.toArray
  @transient private lazy val hiArr: Array[Double] = hi.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorMath.elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sq8_encode argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val out = Quantization.sq8Encode(
      child.dataType, v.asInstanceOf[ArrayData], loArr, hiArr)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def genCall(ctx: CodegenContext, childVar: String): String = {
    val l = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val h = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    val dt = ctx.addReferenceObj("sqDt", child.dataType,
      "org.apache.spark.sql.types.DataType")
    s"graft.functions.Quantization.sq8Encode($dt, $childVar, $l, $h)"
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQ8 decode — see [[Quantization.sq8Decode]]. */
case class Sq8DecodeExpr(
    child: Expression, lo: Seq[Double], hi: Seq[Double]) extends QuantKernel {

  require(lo.length == hi.length, "lo/hi must agree")
  @transient private lazy val loArr: Array[Double] = lo.toArray
  @transient private lazy val hiArr: Array[Double] = hi.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("sq8_decode takes ARRAY<INT>")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val out = Quantization.sq8Decode(v.asInstanceOf[ArrayData], loArr, hiArr)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def genCall(ctx: CodegenContext, childVar: String): String = {
    val l = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val h = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    s"graft.functions.Quantization.sq8Decode($childVar, $l, $h)"
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
