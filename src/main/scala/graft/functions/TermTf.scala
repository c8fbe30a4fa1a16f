package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document term frequencies for a BOUNDED query-term list
  * plus the document length — the BM25 posting walk (q149/q175). The
  * previous shape built a full-vocabulary TokenFreqMap per document and
  * exploded every distinct term just to keep |terms| of them; this walks
  * the normalized text's UTF-8 bytes once and emits only (nw, tf[terms]).
  *
  * Token semantics are exactly `split(norm, ' ')`: boundaries at single
  * 0x20 bytes (consecutive spaces yield empty tokens; the empty string is
  * one empty token), so nw ≡ `size(split(norm, ' '))` and tf_i ≡ the count
  * of tokens byte-equal to terms(i).
  *
  * The term list is a constructor parameter (already collected from the
  * stats-gated query-terms frame — bounded by the broadcast cap), not an
  * Expression child: it is query-sized data, fixed for the whole scan.
  */
case class TermTf(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_tf requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("tf", ArrayType(LongType, containsNull = false),
      nullable = false)))

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nw = 1L
    val tf = new Array[Long](termBytes.length)
    var tokStart = 0
    var i = 0
    def endToken(end: Int): Unit = {
      val len = end - tokStart
      var k = 0
      while (k < termBytes.length) {
        val t = termBytes(k)
        if (t.length == len) {
          var j = 0
          var eq = true
          while (eq && j < len) { eq = bytes(tokStart + j) == t(j); j += 1 }
          if (eq) { tf(k) += 1L; k = termBytes.length }
          else k += 1
        } else k += 1
      }
    }
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { endToken(i); nw += 1; tokStart = i + 1 }
      i += 1
    }
    endToken(bytes.length)
    new GenericInternalRow(Array[Any](nw, new GenericArrayData(tf)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression instance is reachable from generated code via a
    // reference object — standard pattern for params codegen can't inline
    val ref = ctx.addReferenceObj("termTf", this, classOf[TermTf].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermTf =
    copy(child = newChild)
}

object TermTf {
  def apply(c: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermTf(ColumnBridge.expression(c), terms))
}
