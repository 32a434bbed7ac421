package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD) over a string
  * column.
  *
  * Spark has no built-in Unicode-normalization function, yet every
  * production corpus pipeline canonicalizes text BEFORE content hashing
  * and shingling — "Café" composed (U+00E9) and decomposed (e +
  * U+0301) are byte-different, so un-normalized exact dedup silently
  * keeps both copies (the reference's `sanitize_dataframe`,
  * data_pipeline.py:20-23, is the parity anchor for a canonicalize-
  * before-write step). Per SURVEY §4.3(b) the extension of choice is a
  * native Catalyst `Expression` with `doGenCode`, not a UDF: this sits
  * in the hot per-document path ahead of sha2/shingle ops and must stay
  * inside whole-stage codegen.
  *
  * `java.text.Normalizer.normalize` is the JDK's ICU-derived
  * implementation — deterministic for a given Unicode version, ASCII
  * fast-path (`Normalizer.isNormalized` is O(n) with no allocation for
  * already-NFC text, which is ~all of a real crawl corpus).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType if Set("NFC", "NFD", "NFKC", "NFKD")(form) =>
        TypeCheckResult.TypeCheckSuccess
      case _: StringType =>
        TypeCheckResult.TypeCheckFailure(s"unknown normalization form $form")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: already-normalized text (the common case for real
    // corpora) skips re-encoding. clone(), NOT the input reference: the
    // incoming UTF8String points into a row buffer the scan reuses for
    // the next row — returning it un-copied aliases mutating memory
    // (surfaced as a NONDETERMINISTIC self-comparison by the
    // idempotence property test: count() saw 20 "diffs", collect() saw 0)
    if (Normalizer.isNormalized(s, normForm))
      input.asInstanceOf[UTF8String].clone()
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", normForm,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      // same clone() rationale as nullSafeEval: never hand back a
      // pointer into the scan's reused row buffer
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
         |  ? $c.clone()
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $formRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Column API: `unicodeNormalize($"text", "NFKC")`. */
  def apply(c: Column, form: String): Column =
    GraftExpressionBridge.column(
      UnicodeNormalize(GraftExpressionBridge.expression(c), form))
}
