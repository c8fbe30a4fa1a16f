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

  // "0|".."3|" seed prefixes, fed to the digest before the shingle bytes
  private val seedPrefix: Array[Array[Byte]] =
    Array.tabulate(4)(j => s"$j|".getBytes("UTF-8"))

  /** Empty array when the doc has fewer than 3 words (no shingles) — the
    * band explode then yields no rows, matching the grouped formulation
    * which produced no row for such docs.
    *
    * Hot-path notes (identical output to the string formulation): minima
    * are tracked as raw 16-byte digests — unsigned byte order equals hex
    * string order, so only the four FINAL minima are hex-encoded; shingle
    * bytes are assembled once per window and shared by all four seeded
    * digests via incremental `update` calls.
    */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val mins = new Array[Array[Byte]](4)
    var buf = new Array[Byte](64)
    var i = 0
    while (i <= n - 3) {
      var len = 0
      var k = 0
      while (k < 3) {
        val w = words.getUTF8String(i + k).getBytes
        if (len + w.length + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + w.length + 1))
        if (k > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(w, 0, buf, len, w.length)
        len += w.length
        k += 1
      }
      var j = 0
      while (j < 4) {
        md.reset()
        md.update(seedPrefix(j))
        md.update(buf, 0, len)
        val h = md.digest()
        if (mins(j) == null
          || java.util.Arrays.compareUnsigned(h, mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map { h =>
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((h(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(h(b) & 0xf)
        b += 1
      }
      UTF8String.fromString(new String(hex))
    })
  }

  def apply(words: Column): Column =
    ColumnBridge.column(MinHash4(ColumnBridge.expression(words)))
}
