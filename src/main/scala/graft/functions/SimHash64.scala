package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a word array as ONE map-side expression — the SCALE
  * version of [[SimHash16]]: with 64 bits, 16-bit LSH bands have 65,536
  * buckets each, so band joins stay selective on corpora of any size
  * (16-bit signatures give 16 values per 4-bit band — the band join
  * degenerates to all-pairs/16, measured 67s at sf0.1 before this
  * expression existed).
  *
  * Bit b (0..63) votes with bit b of md5(word) (big-endian over the digest
  * bytes; equivalently: bit 3−(b mod 4) of hex digit b/4, which is how the
  * DuckDB oracle mirrors it). Output is a 64-char '0'/'1' string so band
  * extraction and Hamming comparison are identical plain string ops in
  * both engines.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(words: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val md = digest.get()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        md.reset()
        val h = md.digest(w.getBytes)
        var b = 0
        while (b < 64) {
          val bit = (h(b >> 3) >> (7 - (b & 7))) & 1
          counts(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val bits = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      bits(b) = if (counts(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(bits)
  }

  def apply(words: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(words)))
}
