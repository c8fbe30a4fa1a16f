package graft

import graft.functions.{BasketTags, BigramFreq, GateStats, TermTf}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Input-contract pins for the round-11 native expressions (VERDICT r11
  * #8): every admitted input has DEFINED behavior — null in, null out
  * (UnaryExpression default); empty / whitespace-only / degenerate
  * inputs produce the documented values, byte-identical to the composed
  * split()-based forms they replaced; inadmissible schemas are rejected
  * by the type check, not silently mis-evaluated.
  */
class ExprContractsSpec extends SparkSpec {

  import spark.implicits._

  private def oneRow(c: org.apache.spark.sql.Column): Row =
    Seq(1).toDF("x").select(c.as("r")).collect()(0)

  test("BigramFreq: null, empty, and empty-token inputs") {
    // null text -> null array
    assert(oneRow(BigramFreq(lit(null).cast("string"))).isNullAt(0))
    // empty string = ONE empty token -> no bigram -> empty array
    assert(oneRow(BigramFreq(lit(""))).getSeq[Row](0) === Seq.empty)
    // single token -> empty array
    assert(oneRow(BigramFreq(lit("word"))).getSeq[Row](0) === Seq.empty)
    // two spaces = three empty tokens -> the ("","") bigram twice,
    // collapsed to one distinct row with n=2 (split() semantics: no trim)
    assert(oneRow(BigramFreq(lit("  "))).getSeq[Row](0) ===
      Seq(Row("", "", 2L)))
    // repeated bigram collapses; first-seen order
    assert(oneRow(BigramFreq(lit("a b a b"))).getSeq[Row](0) ===
      Seq(Row("a", "b", 2L), Row("b", "a", 1L)))
    // non-string input rejected at analysis
    val err = intercept[Exception](oneRow(BigramFreq(lit(7))))
    assert(err.getMessage.contains("bigram_freq") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("BasketTags: null, empty, singleton, and nullable-element inputs") {
    // split()-derived arrays carry the admitted containsNull=false schema
    val empty = array_remove(split(lit(""), " "), "")
    // null basket -> null (split() carries the admitted containsNull=false
    // schema and yields null on null input)
    assert(oneRow(BasketTags(split(lit(null).cast("string"), " ")))
      .isNullAt(0))
    // empty basket -> exactly the session tag
    assert(oneRow(BasketTags(empty)).getSeq[Row](0) === Seq(Row(null, null)))
    // singleton -> session + item tag, no pairs
    assert(oneRow(BasketTags(split(lit("x"), " "))).getSeq[Row](0) ===
      Seq(Row(null, null), Row("x", null)))
    // 3 items -> 1 + 3 + 3 tags, pairs in (i, j) basket order
    assert(oneRow(BasketTags(split(lit("a b c"), " "))).getSeq[Row](0) ===
      Seq(Row(null, null), Row("a", null), Row("b", null), Row("c", null),
        Row("a", "b"), Row("a", "c"), Row("b", "c")))
    // containsNull=true schema rejected by the type check: compute() reads
    // every element's bytes and has no semantics for a null item
    val err = intercept[Exception](
      oneRow(BasketTags(lit(null).cast("array<string>"))))
    assert(err.getMessage.contains("basket_tags") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("TermTf: null, empty text, empty term list, empty-string term") {
    // null text -> null struct
    assert(oneRow(TermTf(lit(null).cast("string"), Seq("a"))).isNullAt(0))
    // empty text is ONE empty token: nw=1, no term hits
    assert(oneRow(TermTf(lit(""), Seq("a", "b"))).getStruct(0) ===
      Row(1L, Seq(0L, 0L)))
    // empty TERM matches exactly the empty tokens ("a  b" = a,"",b)
    assert(oneRow(TermTf(lit("a  b"), Seq("", "a"))).getStruct(0) ===
      Row(3L, Seq(1L, 1L)))
    // empty term list: nw still counted, tf empty
    assert(oneRow(TermTf(lit("x y"), Seq.empty)).getStruct(0) ===
      Row(2L, Seq.empty[Long]))
    // a token credits only the FIRST matching term slot — the term list
    // contract is distinct terms (the stats-gated collect dedups); a
    // duplicated term must not double-count
    assert(oneRow(TermTf(lit("a a"), Seq("a", "a"))).getStruct(0) ===
      Row(2L, Seq(2L, 0L)))
    // non-string input rejected
    val err = intercept[Exception](oneRow(TermTf(lit(3), Seq("a"))))
    assert(err.getMessage.contains("term_tf") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("GateStats: null, empty, stopword and case contracts") {
    // null -> null
    assert(oneRow(GateStats(lit(null).cast("string"))).isNullAt(0))
    // empty string = one empty token: nw=1, nothing alphabetic
    assert(oneRow(GateStats(lit(""))).getStruct(0) === Row(1L, 0L, 0L))
    // spaces only: nw = spaces+1, zero alpha/stop
    assert(oneRow(GateStats(lit("   "))).getStruct(0) === Row(4L, 0L, 0L))
    // stopword hit is whole-token equality; digits aren't alpha
    assert(oneRow(GateStats(lit("the cat 42"))).getStruct(0) ===
      Row(3L, 2L, 1L))
    // input contract is NORMALIZED (lowercased) text: uppercase bytes are
    // not [a-z] — mirroring rlike('[a-z]') on the composed form exactly
    assert(oneRow(GateStats(lit("THE"))).getStruct(0) === Row(1L, 0L, 0L))
    // "thee" is not "the": no substring stop hits
    assert(oneRow(GateStats(lit("thee and1"))).getStruct(0) ===
      Row(2L, 2L, 0L))
    // non-string input rejected
    val err = intercept[Exception](oneRow(GateStats(lit(1.5))))
    assert(err.getMessage.contains("gate_stats") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
