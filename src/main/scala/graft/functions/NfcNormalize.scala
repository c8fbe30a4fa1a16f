package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text
  * canonicalization step a multilingual curation pipeline runs before any
  * hashing or dedup (decomposed "e" + U+0301 and precomposed "é" must
  * fingerprint identically or every md5/minhash/simhash key silently
  * forks on encoding provenance). Spark has no normalization builtin;
  * the JDK's `java.text.Normalizer` (ICU-equivalent for the canonical
  * forms) is called directly from generated code, so the expression
  * stays inside WholeStageCodegen with zero wrapper allocation. Fast
  * path: `Normalizer.isNormalized` is O(n) with no allocation and true
  * for virtually all real text (ASCII is always NFC), so the common case
  * returns the input UTF8String untouched.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode canonical
  * composition, which is what makes the oracle comparison exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted and generated code. */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
