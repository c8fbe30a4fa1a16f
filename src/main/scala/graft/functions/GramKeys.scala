package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** DISTINCT 60-bit n-gram keys per document, in ONE map-side pass over the
  * words array.
  *
  * Key identity: each key is the first 15 hex digits of
  * `md5(w_i || ' ' || … || w_{i+n-1})` read as an unsigned integer —
  * byte-identical to the composed
  * `conv(substring(md5(concat_ws(' ', …)), 1, 15), 16, 10)` formulation
  * and to the DuckDB oracle's `CAST('0x' || substr(md5(s), 1, 15) AS
  * BIGINT)` (Pipeline.sqlHashGram). Deduplication happens inside the
  * expression, so the exploded (doc_id, key) stream is ALREADY the
  * distinct inverted index: the explode+concat string churn AND the
  * corpus-wide distinct shuffle both disappear from the index build —
  * the heaviest phase of q31/q33/q34/q91 at sf1 (measured 17.9 s → see
  * PERF.md). Docs with <n words yield an empty array (no shingles),
  * matching the composed form.
  */
case class GramKeys(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram_keys n must be >= 1, got $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"gram_keys requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramKeys.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKeys.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramKeys =
    copy(child = newChild)
}

object GramKeys {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val seen = new java.util.HashSet[java.lang.Long](len * 2)
    val out = new Array[Long](len - n + 1)
    var outN = 0
    var buf = new Array[Byte](64)
    var i = 0
    while (i <= len - n) {
      // gram bytes assembled directly (no String round-trip): UTF-8 word
      // bytes joined by ' ' are byte-identical to the composed
      // concat_ws(' ', …) input md5 sees
      var blen = 0
      var k = 0
      while (k < n) {
        val w = words.getUTF8String(i + k).getBytes
        if (blen + w.length + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, blen + w.length + 1))
        if (k > 0) { buf(blen) = ' '; blen += 1 }
        System.arraycopy(w, 0, buf, blen, w.length)
        blen += w.length
        k += 1
      }
      md.reset()
      md.update(buf, 0, blen)
      val h = md.digest()
      // first 15 hex digits == first 7 bytes + the high nibble of byte 7,
      // read big-endian as an unsigned 60-bit value
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v = (v << 4) | ((h(7) >> 4) & 0xfL)
      if (seen.add(v)) { out(outN) = v; outN = outN + 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(GramKeys(ColumnBridge.expression(words), n))
}
