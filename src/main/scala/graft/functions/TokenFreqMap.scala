package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency map in ONE map-side pass over the words
  * array: `map<term, tf>` with one entry per DISTINCT term. Exploding the
  * map yields the (doc, term, tf) stream directly, so the tf stage of
  * tf-idf (q104) skips the corpus-wide groupBy(doc, term) shuffle — rows
  * leave the scan already reduced to distinct (doc, term) pairs; only the
  * (small) document-frequency aggregate and the top-k window shuffle.
  */
case class TokenFreqMap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"token_freq_map requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenFreqMap.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenFreqMap.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenFreqMap =
    copy(child = newChild)
}

object TokenFreqMap {
  def compute(words: ArrayData): MapData = {
    val n = words.numElements()
    // insertion-ordered so output is deterministic (first-seen order);
    // consumers treat it as a set of (term, tf) pairs. Keys are cloned:
    // getUTF8String may return views into a reused scan buffer.
    val freq = new java.util.LinkedHashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val prev = freq.get(w)
      if (prev == null) freq.put(w.clone(), java.lang.Long.valueOf(1L))
      else freq.put(w, java.lang.Long.valueOf(prev.longValue + 1L))
      i += 1
    }
    val keys = new Array[Any](freq.size)
    val vals = new Array[Any](freq.size)
    val it = freq.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = java.lang.Long.valueOf(e.getValue.longValue)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(TokenFreqMap(ColumnBridge.expression(c)))
}
