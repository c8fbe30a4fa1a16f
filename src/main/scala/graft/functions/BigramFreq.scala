package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DISTINCT bigram counts in ONE byte walk over the
  * normalized text — the native form of q132's
  * `split → zip_with(slice, slice, struct) → explode → groupBy(doc, w1,
  * w2)` pre-reduction. The composed chain ran the zip_with lambda as
  * CodegenFallback (an interpreted closure per token, after TWO slice
  * copies of the word array per document) and then paid a full hash
  * aggregation to collapse within-doc repeats; this walks the UTF-8
  * bytes once and emits the already-collapsed (w1, w2, n) rows, so the
  * explode output IS the doc-distinct gram stream — by construction no
  * raw occurrence can ever cross an exchange.
  *
  * Token semantics are exactly `split(norm, ' ')` (the TermTf contract):
  * boundaries at single 0x20 bytes, consecutive spaces yield empty
  * tokens. A bigram's key is the contiguous byte span from w1's first
  * byte to w2's last — adjacent tokens are separated by exactly one
  * space, so the span embeds "w1 w2" verbatim and hashing/equality need
  * no concatenation; spans are cloned only on first insertion. Documents
  * with fewer than two tokens (no space byte) return an empty array.
  * Output order is first-seen, deterministic for a given input.
  */
case class BigramFreq(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_freq requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BigramFreq.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramFreq.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BigramFreq =
    copy(child = newChild)
}

object BigramFreq {

  /** value = (count, w1 byte length) — w1len splits the span back into
    * (w1, w2) once per DISTINCT bigram at output time
    */
  def compute(norm: UTF8String): GenericArrayData = {
    val bytes = norm.getBytes
    // first-seen insertion order → deterministic output
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var prevStart = -1 // previous token's first byte, -1 before token 0
    var tokStart = 0
    var i = 0
    def endToken(end: Int): Unit = {
      if (prevStart >= 0) {
        // span [prevStart, end) = "w1 w2" (single 0x20 between them)
        val probe = UTF8String.fromAddress(
          bytes, Platform.BYTE_ARRAY_OFFSET + prevStart, end - prevStart)
        val hit = m.get(probe)
        if (hit == null)
          m.put(probe.clone(), Array(1L, (tokStart - 1 - prevStart).toLong))
        else hit(0) += 1L
      }
      prevStart = tokStart
    }
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { endToken(i); tokStart = i + 1 }
      i += 1
    }
    endToken(bytes.length)
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      val w1len = e.getValue()(1).toInt
      val row = new GenericInternalRow(3)
      row.update(0, UTF8String.fromBytes(kb, 0, w1len))
      row.update(1, UTF8String.fromBytes(kb, w1len + 1, kb.length - w1len - 1))
      row.setLong(2, e.getValue()(0))
      out(k) = row.asInstanceOf[InternalRow]
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(BigramFreq(ColumnBridge.expression(c)))
}
