package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-document token-frequency statistics in ONE map-side pass over the
  * words array: total tokens, distinct tokens, and the highest single-token
  * frequency. Replaces the explode → groupBy(doc, word) → re-aggregate
  * chain (two shuffles whose row count is the CORPUS token count) with a
  * per-row hash map over one document's words — the repetition-metrics
  * operator (q101) becomes shuffle-free. Semantics are identical: counts
  * over exact string equality of the (already normalized) words.
  */
case class TokenFreqStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"token_freq_stats requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TokenFreqStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenFreqStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenFreqStats =
    copy(child = newChild)
}

object TokenFreqStats {
  def compute(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val freq = new java.util.HashMap[String, Int](n * 2)
    var maxTf = 0
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      val c = freq.getOrDefault(w, 0) + 1
      freq.put(w, c)
      if (c > maxTf) maxTf = c
      i += 1
    }
    InternalRow(n.toLong, freq.size.toLong, maxTf.toLong)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(TokenFreqStats(ColumnBridge.expression(c)))
}
