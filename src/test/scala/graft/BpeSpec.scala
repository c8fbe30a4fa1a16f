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

  /** Driver-side brute-force BPE trainer over a word-count map: full pair
    * recount from scratch every step — no heap, no incremental updates,
    * no shared code with Bpe.trainDriver — stopping at pair exhaustion.
    */
  private def bruteLearn(freq: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] =
      freq.map { case (w, c) => w.split("").toSeq -> c }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= k && !dry) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((x, y), m) => (-m, x, y) }.head
        merges += ((step, a, b, n))
        vocab = vocab.groupMapReduce { case (syms, _) => refMerge(syms, a, b) }(_._2)(_ + _)
        step += 1
      }
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

  /** Run `body` with the driver-vocab cap planted to 0 (forcing the
    * distributed per-step loop), restoring the default after.
    */
  private def forceDistributed[A](body: => A): A = {
    spark.conf.set(Bpe.DriverVocabCapConf, "0")
    try body finally spark.conf.unset(Bpe.DriverVocabCapConf)
  }

  test("driver trainer == distributed loop under a planted cap (q34 pattern)") {
    val d = "/root/testdata/sf0.001"
    // deep enough that incremental pair updates have compounded for many
    // rounds, small enough that 24 argmax jobs stay test-budget sane
    val k = 24
    val (dm, dv) = Bpe.learn(spark, d, k) // vocab 31 rows -> driver path
    val (xm, xv) = forceDistributed(Bpe.learn(spark, d, k))
    assert(dm === xm)
    def tokens(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cnt"), explode(col("syms")).as("t"))
        .groupBy("t").agg(sum("cnt").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tokens(dv) === tokens(xv))
  }

  test("tied counts on supplementary-plane symbols: driver == distributed tie-break") {
    // ADVICE r12: String.compareTo is UTF-16 code-UNIT order — a
    // surrogate-pair lead (0xD800-0xDBFF) sorts BELOW BMP chars in
    // 0xE000-0xFFFF, while Spark's UTF8String binary order (= code-point
    // order) sorts the supplementary char ABOVE. Tie two pair counts on
    // exactly such symbols and demand the two trainers still agree.
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600
    val words = Array(
      (emoji + "a", 5L, Array(emoji, "a")),
      ("\uFFFD" + "a", 5L, Array("\uFFFD", "a")))
    val (dm, _) = Bpe.trainDriver(words, 1)
    val vocab0 = spark
      .createDataFrame(words.toSeq.map { case (w, c, sy) => (w, c, sy.toSeq) })
      .toDF("word", "cnt", "syms0")
      // split-derived arrays declare non-null elements (BpeMergeStep's
      // input contract); the symbols contain no spaces, so this is exact
      .select(col("word"), col("cnt"),
        array_remove(split(concat_ws(" ", col("syms0")), " "), "").as("syms"))
    val (xm, _) = Bpe.learnDistributed(vocab0, 1)
    assert(dm === xm)
    // code-point order: U+FFFD < U+1F600, so the tied argmax merges
    // (U+FFFD, a) — the pair UTF-16 order would have ranked second
    assert(dm.head.a === "\uFFFD")
  }

  test("K=256 trainer == from-scratch brute force, to exhaustion") {
    val d = "/root/testdata/sf0.001"
    val freq = Bpe.wordFreq(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (bruteMerges, bruteVocab) = bruteLearn(freq, Bpe.K256)
    val (merges, vocabDf) = Bpe.learn(spark, d, Bpe.K256)
    // the 31-word fixture runs dry well before 256 — exhaustion IS the
    // interesting regime (every word fully merged into one token)
    assert(merges.size < Bpe.K256, "fixture expected to run dry")
    assert(merges.size === bruteMerges.size)
    assert(merges.map(m => (m.step, m.a, m.b, m.n)) === bruteMerges)
    val engineTokens = vocabDf.select(col("cnt"), explode(col("syms")).as("t"))
      .groupBy("t").agg(sum("cnt").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bruteTokens = bruteVocab.toSeq
      .flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(engineTokens === bruteTokens)
    // fully-dry corpus: every word is a single token == the word itself
    assert(bruteVocab.keys.forall(_.size == 1))
  }

  /** Sequential rank-order application of the merge table — K
    * BpeMergeStep-semantics passes (the trainer's own formulation).
    */
  private def seqApply(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.split("").toSeq) { case (syms, (a, b)) =>
      refMerge(syms, a, b)
    }

  test("BpeEncode rank loop == sequential merge application per word") {
    val d = "/root/testdata/sf0.001"
    val (merges, vocabDf) = Bpe.learn(spark, d, Bpe.K256)
    val table = merges.map(m => m.a + " " + m.b).toArray
    val pairs = merges.map(m => (m.a, m.b))
    import spark.implicits._
    val encoded = Bpe.wordFreq(spark, d)
      .select(col("word"),
        graft.functions.BpeEncode(
          array_remove(split(col("word"), ""), ""), table).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    encoded.foreach { case (w, toks) =>
      assert(toks === seqApply(w, pairs), s"word $w")
    }
    // and both equal the trainer's own final symbol state
    val trained = vocabDf.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(encoded === trained)
  }

  test("BpeEncode degenerate inputs: empty array, null array, no-rank word") {
    import spark.implicits._
    val table = Array("a b", "ab c")
    def enc(w: String): Seq[String] =
      Seq(w).toDF("w")
        .select(graft.functions.BpeEncode(
          array_remove(split(col("w"), ""), ""), table).as("t"))
        .as[Seq[String]].collect()(0)
    assert(enc("") === Seq.empty)           // empty symbol array
    assert(enc("xyz") === Seq("x", "y", "z")) // no pair has a rank
    assert(enc("abc") === Seq("abc"))       // chained ranks apply in order
    assert(enc("aab") === Seq("a", "ab"))   // greedy-left on the rank-0 pair
    // cast(null) yields a containsNull=true schema -> must be REJECTED by
    // the type check (analysis is eager at select), not silently admitted
    val err = intercept[Exception] {
      Seq("x").toDF("w")
        .select(graft.functions.BpeEncode(
          lit(null).cast("array<string>"), table).as("t"))
        .collect()
    }
    assert(err.getMessage.contains("bpe_encode") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
