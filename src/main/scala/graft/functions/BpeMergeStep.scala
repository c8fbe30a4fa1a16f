package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step: greedy left-to-right replacement of every
  * non-overlapping adjacent (a, b) symbol pair with the merged token
  * a||b — the apply half of byte-pair-encoding vocabulary induction
  * (Sennrich et al.'s `merge_vocab`, the per-word inner loop of every
  * BPE trainer). Greedy-scan is provably identical to the oracle's
  * left-fold formulation: a fold merges when the accumulator's LAST
  * symbol equals `a`, and a just-merged last symbol is `a||b`, which can
  * never equal `a` (`b` is non-empty) — so both consume the same pairs.
  *
  * A composed transform/aggregate lambda chain would run as
  * CodegenFallback per word per step; this walks the symbol array once
  * per step with no intermediate allocation beyond the output. Null
  * handling: null input array, null `a`/`b` → null (TernaryExpression
  * default); null ELEMENTS are rejected by the type check — every
  * caller derives symbols from split(), which declares non-null
  * elements, and merged outputs of this expression stay non-null.
  */
case class BpeMergeStep(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, false), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_step requires (array<string> with non-null elements, " +
          s"string, string), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeMergeStep.compute(
      syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a, b) =>
      s"${ev.value} = graft.functions.BpeMergeStep.compute($s, $a, $b);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeMergeStep =
    copy(first = f, second = s, third = t)
}

object BpeMergeStep {

  def compute(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[Any](n)
    var o = 0
    var i = 0
    val merged = UTF8String.concat(a, b)
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i).equals(a)
        && syms.getUTF8String(i + 1).equals(b)) {
        out(o) = merged
        i += 2
      } else {
        out(o) = syms.getUTF8String(i)
        i += 1
      }
      o += 1
    }
    if (o == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], o))
  }

  /** Column-API entry point: apply merge (a, b) to a symbol array. */
  def apply(syms: Column, a: Column, b: Column): Column =
    ColumnBridge.column(BpeMergeStep(
      ColumnBridge.expression(syms),
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
