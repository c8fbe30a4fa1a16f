package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE tokenization of a symbol array under a TRAINED merge table in
  * ONE map-side pass — the standard greedy lowest-rank-pair loop every
  * production BPE encoder runs (GPT-2's `bpe()`, SentencePiece's BPE
  * apply): repeatedly find the adjacent pair with the LOWEST merge rank
  * and greedily merge all its occurrences, until no adjacent pair has a
  * rank.
  *
  * Why this equals K sequential [[BpeMergeStep]] passes in rank order
  * (the trainer's own formulation): applying merge r is a no-op until
  * merges 1..r-1 that feed it have applied, and — the key invariant of a
  * CONSISTENTLY TRAINED table — a merge can only create pairs of HIGHER
  * rank than itself (the merged token a||b exists as a symbol only after
  * merge r is learned, so any merge consuming it was learned later).
  * Hence at every point the lowest-ranked pair present is exactly the
  * next sequential merge with any effect, and both orders produce the
  * same symbols (pinned differentially in BpeSpec). The win is the cost
  * model: sequential application is K plan nodes / K array rewrites per
  * word (untenable at K=10³..10⁵ real-tokenizer scale); this is one
  * expression whose inner loop touches only the pairs actually present
  * in the word.
  *
  * The table rides in the expression as `merges(i) = a + " " + b`
  * (rank = index i; the space join is unambiguous because symbols come
  * from splitting space-delimited words and can never contain a space).
  * The derived rank HashMap is built once per executor via the codegen
  * reference object, never per row.
  *
  * Contract: input must be array<string> with non-null elements (split()
  * output — same stance as BpeMergeStep); an arbitrary UNTRAINED rank
  * table (one where a merge's components are created by a LATER merge)
  * is outside the equivalence guarantee but still terminates — each
  * iteration strictly shortens the array.
  */
case class BpeEncode(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string> with non-null elements, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks = BpeEncode.buildRanks(merges)

  override def nullSafeEval(syms: Any): Any =
    BpeEncode.compute(syms.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeEncode.compute($s, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def buildRanks(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // first write wins: rank = earliest occurrence, matching the
      // trainer's "a pair is learned once" invariant
      m.putIfAbsent(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def compute(symsData: ArrayData,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n0 = symsData.numElements()
    var arr = new Array[String](n0)
    var i = 0
    while (i < n0) { arr(i) = symsData.getUTF8String(i).toString; i += 1 }
    var n = n0
    var done = n < 2
    while (!done) {
      // lowest-rank adjacent pair present (leftmost on rank ties is
      // irrelevant: the greedy scan below merges EVERY occurrence)
      var bestRank = Integer.MAX_VALUE
      var bi = -1
      i = 0
      while (i < n - 1) {
        val r = ranks.get(arr(i) + " " + arr(i + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val a = arr(bi); val b = arr(bi + 1); val ab = a + b
        // greedy left-to-right non-overlapping merge of (a, b) — the
        // exact BpeMergeStep.compute scan, on the dense String array
        val out = new Array[String](n)
        var o = 0
        i = 0
        while (i < n) {
          if (i + 1 < n && arr(i) == a && arr(i + 1) == b) {
            out(o) = ab; i += 2
          } else { out(o) = arr(i); i += 1 }
          o += 1
        }
        arr = out; n = o
        if (n < 2) done = true
      }
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(arr(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point: tokenize `syms` under the rank-ordered merge
    * table (`merges(i)` = a + " " + b learned at rank i).
    */
  def apply(syms: Column, merges: Array[String]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(syms), merges))
}
