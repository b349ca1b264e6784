package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass fingerprint kernels for the dedup family.
  *
  * These turn the minhash/simhash signature computations into pure
  * per-row projections: the previous forms exploded shingles/tokens and
  * re-grouped by document (a full shuffle of #docs × #shingles rows,
  * twice for simhash) — at 100 TB that shuffle IS the job. A signature
  * only needs its own document's tokens, so the kernels fold everything
  * document-locally inside whole-stage codegen; the only remaining
  * shuffles in the dedup pipelines are the (tiny) signature band joins.
  *
  * Value parity with the exploded forms is exact, because the reductions
  * are order-insensitive: a min over shingle instances equals the min
  * over distinct shingles, and Σ_distinct count·(±1 per bit) equals
  * Σ_instances (±1 per bit). Hash derivations reproduce
  * [[graft.llm.TextFunctions.hash60]]/hash48 bit-for-bit (md5 → leading
  * 60/48 bits), so the DuckDB oracles keep hashing identically. */
object TextKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Leading 60 bits of an md5 digest (= first 15 hex chars base-16). */
  private def lead60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Leading 48 bits (= first 12 hex chars base-16). */
  private def lead48(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 16
  }

  /** MinHash signature straight from the TOKEN array: per window of `n`
    * tokens, the shingle bytes stream into md5 exactly as
    * `concat_ws(" ", slice(tokens, j, n))` would produce them (single
    * spaces, null tokens skipped) — no intermediate shingle strings or
    * arrays are materialized. h0 = lead60(md5) mod p, then min_i over
    * (a_i·h0 + b_i) mod p. Null when the doc is too short to shingle
    * (matching the exploded form, where such docs vanish in the agg). */
  def minhashSig(
      tokens: ArrayData, n: Int,
      as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    if (tokens == null) return null
    val m = tokens.numElements()
    if (m < n) return null
    val mins = Array.fill(as.length)(Long.MaxValue)
    val md = md5Local.get()
    var j = 0
    while (j <= m - n) {
      var first = true
      var i = j
      while (i < j + n) {
        if (!tokens.isNullAt(i)) {
          if (!first) md.update(' '.toByte)
          md.update(tokens.getUTF8String(i).getBytes)
          first = false
        }
        i += 1
      }
      val h0 = lead60(md.digest()) % p
      var k = 0
      while (k < as.length) {
        val v = (as(k) * h0 + bs(k)) % p
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  private val SimhashPrefix = "sh:".getBytes("UTF-8")

  /** 48-bit SimHash over token instances: bit j set when
    * Σ ±1 over instances (by bit j of lead48(md5("sh:"+token))) > 0. */
  def simhash48(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val sums = new Array[Long](48)
    val md = md5Local.get()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.update(SimhashPrefix)
        val h = lead48(md.digest(tokens.getUTF8String(t).getBytes))
        var j = 0
        while (j < 48) {
          sums(j) += (((h >>> j) & 1L) * 2L - 1L)
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 48) {
      if (sums(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Greedy BPE merge application (the tokenizer APPLY side — merges are
    * trained once offline, e.g. from the q100-style pair census): for
    * each ranked merge (a_i, b_i) one left-to-right pass replaces every
    * non-overlapping adjacent (a_i, b_i) token pair with the merged
    * symbol c_i. Null if the token array holds a null element. */
  def bpeApply(
      tokens: ArrayData,
      as: Array[org.apache.spark.unsafe.types.UTF8String],
      bs: Array[org.apache.spark.unsafe.types.UTF8String],
      cs: Array[org.apache.spark.unsafe.types.UTF8String]): ArrayData = {
    var cur = new Array[org.apache.spark.unsafe.types.UTF8String](tokens.numElements())
    var i = 0
    while (i < cur.length) {
      if (tokens.isNullAt(i)) return null
      cur(i) = tokens.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < as.length) {
      val a = as(m); val b = bs(m); val c = cs(m)
      val out = new Array[org.apache.spark.unsafe.types.UTF8String](cur.length)
      var n = 0
      var j = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && cur(j).equals(a) && cur(j + 1).equals(b)) {
          out(n) = c; n += 1; j += 2
        } else {
          out(n) = cur(j); n += 1; j += 1
        }
      }
      cur = java.util.Arrays.copyOf(out, n)
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}

/** `minhash_sig(tokens)`: array of k affine-family minima over the
  * doc's n-token shingles (see [[TextKernels.minhashSig]]); n and the
  * (a_i, b_i) constants ride the expression. Null for docs too short
  * to shingle. */
case class MinHashSig(
    child: Expression, n: Int, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty && n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("minhash_sig takes ARRAY<STRING>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSig(v.asInstanceOf[ArrayData], n, asArr, bsArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val asRef = ctx.addReferenceObj("mhAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bsArr, "long[]")
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextKernels.minhashSig(
            ${c.value}, $n, $asRef, $bsRef, ${p}L);
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash48(tokens)`: the 48-bit SimHash fingerprint as a long. */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("simhash48 takes ARRAY<STRING>")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash48(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextKernels.simhash48(${c.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_apply(tokens)`: greedy ranked-merge application (see
  * [[TextKernels.bpeApply]]); the merge table rides the expression as
  * (a, b) pairs, the merged symbol is their concatenation. */
case class BpeApply(child: Expression, merges: Seq[(String, String)],
    /** Explicit merged-token forms, parallel to `merges`; empty = plain
      * concatenation a+b (classic BPE). WordPiece passes
      * `a + b.stripPrefix("##")` so continuation marks collapse on
      * merge while pair MATCHING stays on the marked symbols. */
    mergedTokens: Seq[String] = Nil)
    extends UnaryExpression {
  require(merges.nonEmpty, "merges must not be empty")
  require(mergedTokens.isEmpty || mergedTokens.length == merges.length,
    "mergedTokens must be empty or parallel to merges")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("bpe_apply takes ARRAY<STRING>")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val asArr =
    merges.map(m => org.apache.spark.unsafe.types.UTF8String.fromString(m._1)).toArray
  @transient private lazy val bsArr =
    merges.map(m => org.apache.spark.unsafe.types.UTF8String.fromString(m._2)).toArray
  @transient private lazy val csArr = {
    val joined =
      if (mergedTokens.nonEmpty) mergedTokens
      else merges.map(m => m._1 + m._2)
    joined.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.bpeApply(v.asInstanceOf[ArrayData], asArr, bsArr, csArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val utf8Arr = "org.apache.spark.unsafe.types.UTF8String[]"
    val aRef = ctx.addReferenceObj("bpeAs", asArr, utf8Arr)
    val bRef = ctx.addReferenceObj("bpeBs", bsArr, utf8Arr)
    val cRef = ctx.addReferenceObj("bpeCs", csArr, utf8Arr)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextKernels.bpeApply(
            ${c.value}, $aRef, $bRef, $cRef);
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
