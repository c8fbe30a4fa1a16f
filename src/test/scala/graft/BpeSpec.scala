package graft

import graft.functions.BpeMergeStep
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: the native merge step must equal the
  * reference greedy algorithm (Sennrich et al.'s merge_vocab) on
  * adversarial symbol streams, and the learn loop must reproduce a
  * driver-side brute-force trainer exactly — merges, tie-breaks and
  * counts.
  */
class BpeSpec extends SparkSpec {

  /** Reference greedy left-to-right merge (the textbook definition). */
  private def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def engineMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(syms).toDF("w")
      // split-derived arrays declare non-null elements; reproduce that
      .select(array_remove(split(concat_ws(" ", col("w")), " "), "").as("syms"))
      .select(BpeMergeStep(col("syms"), lit(a), lit(b)).as("m"))
      .as[Seq[String]].collect()(0)
  }

  test("native merge step == reference greedy on adversarial streams") {
    val cases = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"),          // overlap chain, even
      (Seq("a", "a", "a"), "a", "a"),               // overlap chain, odd
      (Seq("a", "b", "a", "b", "a"), "a", "b"),     // interleaved
      (Seq("x"), "x", "x"),                         // single symbol
      (Seq("a", "b"), "b", "a"),                    // pair absent
      (Seq("ab", "c", "ab", "c"), "ab", "c"),       // multi-char symbols
      (Seq("a", "ab", "b", "a", "b"), "a", "b"),    // merged-token lookalike
    )
    cases.foreach { case (syms, a, b) =>
      assert(engineMerge(syms, a, b) === refMerge(syms, a, b),
        s"merge ($a,$b) on $syms")
    }
  }

  /** Driver-side brute-force BPE trainer over a word-count map. */
  private def bruteLearn(freq: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] =
      freq.map { case (w, c) => w.split("").toSeq -> c }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    (1 to k).foreach { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val ((a, b), n) = counts.toSeq
        .sortBy { case ((x, y), m) => (-m, x, y) }.head
      merges += ((step, a, b, n))
      vocab = vocab.groupMapReduce { case (syms, _) => refMerge(syms, a, b) }(_._2)(_ + _)
    }
    (merges.result(), vocab)
  }

  test("learn loop reproduces the brute-force trainer on the sf0.001 corpus") {
    val d = "/root/testdata/sf0.001"
    val freq = Bpe.wordFreq(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (bruteMerges, bruteVocab) = bruteLearn(freq, Bpe.K)
    val (merges, vocabDf) = Bpe.learn(spark, d, Bpe.K)
    assert(merges.map(m => (m.step, m.a, m.b, m.n)) === bruteMerges)
    // final tokenization agrees too (weighted token counts)
    val engineTokens = vocabDf.select(col("cnt"), explode(col("syms")).as("t"))
      .groupBy("t").agg(sum("cnt").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bruteTokens = bruteVocab.toSeq
      .flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(engineTokens === bruteTokens)
  }

  test("merge table is deterministic under repartitioning") {
    val d = "/root/testdata/sf0.001"
    val a = Bpe.learn(spark, d, 3)._1
    val b = Bpe.learn(spark, d, 3)._1
    assert(a === b)
  }
}
