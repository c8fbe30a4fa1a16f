package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass quality-gate token statistics — the native form of q136's
  * three interpreted higher-order passes (VERDICT r10 #3: the residual 4.0×
  * sf0.1→sf1 slope was the gate columns, measured ~0.9 s of the 1.6 s sf1
  * total): `size(split(norm,' '))`, `size(filter(ws, rlike '[a-z]'))` and
  * `size(filter(ws, isin(stops)))` each re-walk a freshly allocated token
  * array through CodegenFallback lambdas with a regex per WORD. This walks
  * the UTF-8 bytes once, allocation-free.
  *
  * Byte-identical to the composed columns: tokens are the `split(norm,
  * ' ')` segments (consecutive spaces yield empty tokens, an empty string
  * is one empty token — nw ≡ spaces+1); "has alpha" is `rlike('[a-z]')`
  * (bytes 0x61–0x7a occur in UTF-8 only as the ASCII letters themselves,
  * so the byte scan is exact); the stopword hit is whole-token byte
  * equality against the 5-word gate list.
  */
case class GateStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gate_stats requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    GateStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GateStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

object GateStats {

  /** The gate's stopword list (mirrors TextCuration.gateStops). */
  val Stops: Seq[String] = Seq("the", "and", "of", "to", "a")
  private val stopBytes: Array[Array[Byte]] =
    Stops.map(_.getBytes("UTF-8")).toArray

  def compute(s: UTF8String): GenericInternalRow = {
    val bytes = s.getBytes
    var nw = 1L
    var nAlpha = 0L
    var nStop = 0L
    var tokStart = 0
    var hasAlpha = false
    var i = 0
    def endToken(end: Int): Unit = {
      if (hasAlpha) nAlpha += 1
      val len = end - tokStart
      var k = 0
      var matched = false
      while (!matched && k < stopBytes.length) {
        val st = stopBytes(k)
        if (st.length == len) {
          var j = 0
          var eq = true
          while (eq && j < len) { eq = bytes(tokStart + j) == st(j); j += 1 }
          matched = eq
        }
        k += 1
      }
      if (matched) nStop += 1
      hasAlpha = false
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x20) { endToken(i); nw += 1; tokStart = i + 1 }
      else if (b >= 'a' && b <= 'z') hasAlpha = true
      i += 1
    }
    endToken(bytes.length)
    new GenericInternalRow(Array[Any](nw, nAlpha, nStop))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(GateStats(ColumnBridge.expression(c)))
}
