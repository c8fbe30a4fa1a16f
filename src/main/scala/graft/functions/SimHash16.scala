package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash over a word array as ONE map-side expression.
  *
  * The composed formulation (explode words → md5 → 16 conditional sums →
  * groupBy doc) shuffles every word occurrence; this computes the whole
  * signature per row with zero shuffle and a thread-local reused
  * MessageDigest (Spark's `md5` expression allocates one per call).
  *
  * Bit semantics are identical to the composed version and its DuckDB
  * oracle: bit b = 1 iff Σ over word occurrences of (top bit of hex digit
  * b of md5(word) ? +1 : −1) is > 0. Codegen emits a static call — the
  * loop body is hashing-bound, so fusing into generated Java buys nothing
  * beyond eliminating the virtual eval dispatch.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash16.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(words: ArrayData): UTF8String = {
    val counts = new Array[Int](16)
    val md = digest.get()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        md.reset()
        val h = md.digest(w.getBytes)
        // hex digit b of the md5: high nibble of byte b/2 for even b, low
        // nibble for odd b; its top bit decides the vote
        var b = 0
        while (b < 16) {
          val nibble =
            if ((b & 1) == 0) (h(b >> 1) >> 4) & 0xf else h(b >> 1) & 0xf
          counts(b) += (if (nibble >= 8) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val bits = new Array[Byte](16)
    var b = 0
    while (b < 16) {
      bits(b) = if (counts(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(bits)
  }

  def apply(words: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(words)))
}
