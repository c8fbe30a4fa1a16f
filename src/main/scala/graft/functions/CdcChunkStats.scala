package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Content-defined-chunking statistics in ONE codegen-stage pass — the
  * native form of the q143 composition (Pipeline.cdcChunks): anchor
  * positions are the 1-based word indexes whose 60-bit md5 gram key
  * (identical to [[GramKeys]]/hashGram, so identical to the DuckDB
  * oracle) divides 12, the final boundary is always the word count, and
  * each chunk is the ' '-joined word run between consecutive boundaries.
  * The composed filter/transform/slice/array_distinct chain ran as
  * CodegenFallback — interpreted closures plus a materialized chunk-
  * string array per document; this computes the same statistics in a
  * single walk, hashing each chunk's bytes directly (md5-distinct count
  * == distinct chunk count, the same equivalence the oracle uses).
  *
  * Returns struct<n_chunks, min_words, max_words, n_unique_chunks>, all
  * long; avg_words stays a column expression over size(ws) so the
  * rounding is Spark's own.
  */
case class CdcChunkStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull=false required (ADVICE r10): compute() hashes every
      // element's bytes and would NPE on a null — split() (every caller)
      // declares non-null elements, so admitting nullable arrays only
      // invited an undefined input no semantics were written for
      case ArrayType(StringType, false) =>
        org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"cdc_chunk_stats requires array<string> with non-null " +
              s"elements, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chunks", LongType, nullable = false),
    StructField("min_words", LongType, nullable = false),
    StructField("max_words", LongType, nullable = false),
    StructField("n_unique_chunks", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CdcChunkStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunkStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkStats =
    copy(child = newChild)
}

object CdcChunkStats {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit gram key of one word — byte-identical to [[GramKeys]]. */
  private def wordKey(md: java.security.MessageDigest, w: Array[Byte]): Long = {
    md.reset()
    md.update(w, 0, w.length)
    val h = md.digest()
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
    (v << 4) | ((h(7) >> 4) & 0xfL)
  }

  def compute(ws: ArrayData): GenericInternalRow = {
    val n = ws.numElements()
    val md = digest.get()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = ws.getUTF8String(i).getBytes; i += 1 }
    var nChunks = 0L
    var minW = Long.MaxValue
    var maxW = Long.MinValue
    val seen = new java.util.HashSet[java.math.BigInteger]()
    var start = 0 // 0-based inclusive start of the current chunk
    var buf = new Array[Byte](64)
    var k = 1
    while (k <= n) {
      val isAnchor = wordKey(md, bytes(k - 1)) % 12 == 0
      if (isAnchor || k == n) {
        val len = k - start
        nChunks += 1
        if (len < minW) minW = len
        if (len > maxW) maxW = len
        // chunk bytes = words[start..k-1] joined by ' ' (matches the
        // composed array_join(slice(ws, prev+1, e-prev), " "))
        var blen = 0
        var t = start
        while (t < k) {
          val w = bytes(t)
          if (blen + w.length + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.max(buf.length * 2, blen + w.length + 1))
          if (t > start) { buf(blen) = ' '; blen += 1 }
          System.arraycopy(w, 0, buf, blen, w.length)
          blen += w.length
          t += 1
        }
        md.reset()
        md.update(buf, 0, blen)
        seen.add(new java.math.BigInteger(md.digest()))
        start = k
      }
      k += 1
    }
    if (n == 0) { // split never yields this, but stay total: one empty chunk
      nChunks = 1; minW = 0; maxW = 0
      md.reset()
      seen.add(new java.math.BigInteger(md.digest()))
    }
    val row = new GenericInternalRow(4)
    row.setLong(0, nChunks)
    row.setLong(1, minW)
    row.setLong(2, maxW)
    row.setLong(3, seen.size().toLong)
    row
  }

  def apply(ws: Column): Column =
    ColumnBridge.column(CdcChunkStats(ColumnBridge.expression(ws)))
}
