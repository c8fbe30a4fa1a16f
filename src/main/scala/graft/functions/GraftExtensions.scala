package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` and
  * `simhash16(...)` work anywhere — including through the guarded LLM-SQL
  * path. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or [[GraftExtensions.register]] on a live session.
  *
  * No custom optimizer Rule or SparkStrategy is injected: SURVEY §4.2's
  * audit found stock Catalyst covers every physical need; the extension
  * surface is exactly these scalar expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSim: FnDesc = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cosine_sim(arrayA, arrayB)")
      CosineSim(args(0), args(1))
    })

  val simhash16: FnDesc = (
    FunctionIdentifier("simhash16"),
    new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "simhash16(words)")
      SimHash16(args(0))
    })

  val gramKeys: FnDesc = (
    FunctionIdentifier("gram_keys"),
    new ExpressionInfo(classOf[GramKeys].getName, "gram_keys"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "gram_keys(words, n)")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"gram_keys n must be an integer literal, got $other")
      }
      require(n >= 1, s"gram_keys n must be >= 1, got $n")
      GramKeys(args(0), n)
    })

  val tokenFreqStats: FnDesc = (
    FunctionIdentifier("token_freq_stats"),
    new ExpressionInfo(classOf[TokenFreqStats].getName, "token_freq_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "token_freq_stats(words)")
      TokenFreqStats(args(0))
    })

  val tokenFreqMap: FnDesc = (
    FunctionIdentifier("token_freq_map"),
    new ExpressionInfo(classOf[TokenFreqMap].getName, "token_freq_map"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "token_freq_map(words)")
      TokenFreqMap(args(0))
    })

  val piiStats: FnDesc = (
    FunctionIdentifier("pii_stats"),
    new ExpressionInfo(classOf[PiiStats].getName, "pii_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "pii_stats(text)")
      PiiStats(args(0))
    })

  val nfcNormalize: FnDesc = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "nfc_normalize(text)")
      NfcNormalize(args(0))
    })

  val all: Seq[FnDesc] =
    Seq(cosineSim, simhash16, gramKeys, tokenFreqStats, tokenFreqMap,
      piiStats, nfcNormalize)

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
