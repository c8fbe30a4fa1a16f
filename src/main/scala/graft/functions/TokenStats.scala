package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics over a normalized (single-spaced, trimmed)
  * string: whitespace token count, regex token count
  * (`[a-z]+|[0-9]+|[^a-z0-9 ]` — letter runs, digit runs, single symbols),
  * and the BPE-ish subword estimate Σ ceil(run_len / 4).
  *
  * Replaces three separate passes (split+size, regexp_extract_all+size,
  * regexp_extract_all+transform+aggregate) that each materialize arrays;
  * this allocates nothing and runs the compiled regex once.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"token_stats requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("re_tokens", IntegerType, nullable = false),
    StructField("bpe_est", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  private val pattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var ws = if (str.isEmpty) 1 else 1 // split(" ") on "" yields one token
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') ws += 1
      i += 1
    }
    val m = pattern.matcher(str)
    var re = 0
    var bpe = 0L
    while (m.find()) {
      re += 1
      bpe += (m.end() - m.start() + 3) / 4 // ceil(len/4)
    }
    InternalRow(ws, re, bpe)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(c)))
}
