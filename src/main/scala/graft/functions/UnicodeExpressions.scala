package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression.
  *
  * Web-scale corpora mix composed and decomposed encodings of the same
  * text (é vs e+U+0301), which breaks exact dedup, shingling, and token
  * counting; normalizing is the first step of every curation pipeline.
  * Spark has no built-in for it, and a Scala UDF would fall out of
  * whole-stage codegen and pay SerDe per row. This expression stays in
  * codegen and takes the zero-allocation exit for pure-ASCII rows
  * (`UTF8String.isFullAscii`), which is the overwhelming majority of a
  * crawled corpus — only rows that actually carry non-ASCII bytes pay
  * the String round-trip through `java.text.Normalizer`.
  *
  * NFC (canonical composition) is the storage/dedup form; NFKC
  * additionally folds compatibility variants (ligatures, full-width
  * forms, superscripts) and is the tokenizer-facing form.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(form == "NFC" || form == "NFKC" || form == "NFD" || form == "NFKD",
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** ASCII rows return the input untouched (normalization is identity on
    * ASCII for every form); only non-ASCII rows round-trip to String. */
  def normalize(s: UTF8String, form: String): UTF8String =
    if (s.isFullAscii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))

  /** Column API: `unicodeNormalize(col("content"))` / form "NFKC". */
  def apply(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
