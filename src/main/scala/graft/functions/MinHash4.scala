package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Four seeded MinHash signatures over word 3-gram shingles, computed in
  * ONE map-side pass over the words array.
  *
  * Key identity: min(md5) over a shingle MULTISET equals min over the
  * shingle SET, so the signature needs neither the shingle explode nor the
  * DISTINCT shuffle — those remain only on the exact-Jaccard refinement
  * path, where the inverted index is genuinely needed. Hash values are
  * md5 hex of "<seed>|<shingle>" (seeds 0..3), byte-identical to the
  * composed formulation and its DuckDB oracle; docs with <3 words yield
  * null (no shingles), matching the grouped version which produced no row.
  */
case class MinHash4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"minhash4 requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHash4.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash4.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHash4 =
    copy(child = newChild)
}

object MinHash4 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** Empty array when the doc has fewer than 3 words (no shingles) — the
    * band explode then yields no rows, matching the grouped formulation
    * which produced no row for such docs.
    */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val mins = new Array[String](4)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - 3) {
      sb.setLength(0)
      sb.append(words.getUTF8String(i).toString).append(' ')
        .append(words.getUTF8String(i + 1).toString).append(' ')
        .append(words.getUTF8String(i + 2).toString)
      val shingle = sb.toString
      var j = 0
      while (j < 4) {
        md.reset()
        val h = md.digest((j.toString + "|" + shingle).getBytes("UTF-8"))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(b * 2) = hexChars((h(b) >> 4) & 0xf)
          hex(b * 2 + 1) = hexChars(h(b) & 0xf)
          b += 1
        }
        val s = new String(hex)
        if (mins(j) == null || s.compareTo(mins(j)) < 0) mins(j) = s
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  def apply(words: Column): Column =
    ColumnBridge.column(MinHash4(ColumnBridge.expression(words)))
}
