package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd Catalyst expression.
  *
  * Web-scale corpora mix composed and decomposed accents (café as
  * `e`+U+0301 vs U+00E9), fullwidth forms, ligatures and compatibility
  * variants; exact dedup, shingling and token counting all key on raw
  * bytes, so unnormalized text silently splits what a human reads as
  * one document. The standard scrub-pass fix is a per-row NFC (or
  * NFKC, which also folds compatibility forms) pass before hashing.
  *
  * Spark has no built-in normalizer, so this wraps
  * [[java.text.Normalizer]] in a `UnaryExpression` with `doGenCode`
  * (stays inside whole-stage codegen — a Scala UDF here would break
  * the codegen span around every dedup projection it feeds). The hot
  * path is the all-ASCII row: `Normalizer.isNormalized` is O(n) with
  * no allocation, and already-normalized input is returned as the SAME
  * `UTF8String` (zero copies) — on typical English-heavy corpora the
  * expensive normalize allocation happens only on the rare accented
  * row.
  */
object TextNormalize {

  /** Stable ordinals for codegen (the form is baked into the generated
    * code as an int literal). */
  val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formOrdinal(name: String): Int = {
    val i = Forms.indexWhere(_.name.equalsIgnoreCase(name))
    require(i >= 0, s"unknown normalization form '$name' " +
      s"(expected one of ${Forms.map(_.name).mkString(", ")})")
    i
  }

  /** Kernel shared by eval and generated code. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** `normalize_text(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — see
  * [[TextNormalize]]. */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  private val ordinal = TextNormalize.formOrdinal(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("normalize_text takes STRING")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    TextNormalize.normalize(v.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} =
            graft.functions.TextNormalize.normalize(${c.value}, $ordinal);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
