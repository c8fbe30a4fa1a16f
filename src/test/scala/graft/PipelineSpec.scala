package graft

import graft.operators.Pipeline
import org.apache.spark.sql.DataFrame

/** Behavioral tests for the dedup/text operators on a synthetic corpus with
  * KNOWN duplicates — the driver testdata has none, so these prove the
  * operators actually catch what they claim to catch.
  */
class PipelineSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "under the warm sun and birds sing in the tall green trees all day long"

  // 0/1 exact dups (modulo case+whitespace), 2 near-dup of 0 (2 word edits),
  // 3 unrelated.
  private val corpus = mkDocs(Seq(
    0L -> base,
    1L -> ("  " + base.toUpperCase.replaceAll(" ", "   ") + " "),
    2L -> base.replace("quick", "slow").replace("lazy", "sleepy"),
    3L -> ("completely different content about spark catalyst optimizer " +
      "rules and distributed shuffle partitioning strategies for big data"),
  ))

  test("exact dedup groups case/whitespace-equivalent docs") {
    val groups = Pipeline
      .normDocs(corpus)
      .groupBy(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("norm")))
      .count()
      .collect()
    assert(groups.length === 3) // 0+1 merge; 2 and 3 stand alone
    assert(groups.map(_.getLong(1)).sorted.toSeq === Seq(1L, 1L, 2L))
  }

  test("minhash-LSH finds the near-dup pair and not the unrelated one") {
    val pairs = Pipeline.minhashPairs(Pipeline.normDocs(corpus), 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 2L)), s"expected (0,2) in $pairs")
    assert(pairs.contains((0L, 1L)), "exact dup must also collide")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "doc 3 is unrelated")
  }

  test("incremental minhash equals the full run restricted to new-batch pairs") {
    val norm = Pipeline.normDocs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
    val isNew = org.apache.spark.sql.functions.col("doc_id") % 5 === 0
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairSet(Pipeline.minhashPairs(norm, 0.015))
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    val inc = pairSet(Pipeline.minhashPairsIncremental(
      norm.filter(!isNew), norm.filter(isNew), 0.015))
    assert(inc === full)
    assert(inc.nonEmpty, "split must leave some cross-batch near-dups")
  }

  test("dedup clustering: transitive near-dups collapse to one canonical id") {
    val pairs = Pipeline.minhashPairs(Pipeline.normDocs(corpus), 0.3)
    val clusters = Pipeline.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0,1,2 are one component (0-1 exact, 0-2 near) → canonical 0,
    // size 3; doc 3 has no pairs and is absent
    assert(clusters === Map(0L -> 3L))
    // the driver union-find fast path and the distributed label-prop loop
    // must agree exactly: plant a 0-edge cap to force the RDD loop on the
    // same pairs
    spark.conf.set("graft.cc.localEdgeCap", "0")
    try {
      val looped = Pipeline.dedupClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(looped === clusters,
        "union-find fast path diverges from the distributed loop")
    } finally spark.conf.unset("graft.cc.localEdgeCap")
  }

  test("df-cap drops viral shingles: degenerate corpus stays sub-quadratic") {
    // every doc shares one viral sentence; unique tails otherwise. Without
    // the cap the viral shingles alone produce n*(n-1)/2 candidate rows.
    val viral = "click here to subscribe now"
    val n = 40
    val degenerate = mkDocs((0L until n.toLong).map(i =>
      i -> s"$viral unique$i tail$i words$i extra$i content$i here$i"))
    val sh = Pipeline.shinglesOf(Pipeline.normDocs(degenerate))
    val capped = Pipeline.dfCappedShingles(sh, dfCap = 10)
    // the viral shingles (df = 40 > 10) are gone; per-doc unique ones remain
    val remaining = capped.select("s").distinct().collect().map(_.getString(0))
    assert(remaining.nonEmpty)
    assert(!remaining.exists(_.startsWith("click here")),
      "viral shingle must be dropped")
    // the capped self-join yields ZERO candidate pairs (docs share only
    // viral shingles) instead of 780 — the quadratic blowup is cut at the
    // index, not post-filtered
    val cand = capped.as("a")
      .join(capped.as("b"),
        org.apache.spark.sql.functions.col("a.s") ===
          org.apache.spark.sql.functions.col("b.s") &&
          org.apache.spark.sql.functions.col("a.doc_id") <
            org.apache.spark.sql.functions.col("b.doc_id"))
    assert(cand.count() === 0)
    // and minhashPairs with the same cap completes finding nothing
    val noPairs = Pipeline.minhashPairs(Pipeline.normDocs(degenerate), 0.3, dfCap = 10)
    assert(noPairs.count() === 0)
    // clustering an EMPTY pair set returns an empty frame, not an NPE
    // (the Σlabel potential over zero rows is null)
    assert(Pipeline.dedupClusters(noPairs).count() === 0)
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val sh = Pipeline.simhashOf(Pipeline.normDocs(corpus))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(sh(0L) === sh(1L)) // identical after normalization
    assert(ham(sh(0L), sh(2L)) <= 4, s"near-dup hamming ${ham(sh(0L), sh(2L))}")
    assert(ham(sh(0L), sh(3L)) > 4, s"unrelated hamming ${ham(sh(0L), sh(3L))}")
  }

  test("chunker: boundaries, overlap, and tail handling") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = Pipeline
      .chunksOf(Pipeline.normDocs(mkDocs(Seq(9L -> text))), size = 200, overlap = 40)
      .collect()
      .sortBy(_.getAs[Int]("chunk_idx"))
    assert(chunks.length === 4) // starts 0,160,320,480
    val texts = chunks.map(_.getAs[String]("chunk"))
    assert(texts(0).length === 200 && texts(1).length === 200)
    assert(texts(3).length === 520 - 480) // tail
    // consecutive chunks overlap by exactly 40 chars
    assert(texts(0).takeRight(40) === texts(1).take(40))
    assert(text.startsWith(texts(0)))
  }

  test("language id picks the language whose stopwords dominate") {
    val docs = mkDocs(Seq(
      10L -> "el perro y la casa de que el y la comida",
      11L -> "the dog and the house of the food to a home",
      12L -> "xyzzy plugh foobar qux", // no stopwords at all
    ))
    val got = Pipeline.langIdOf(Pipeline.normDocs(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) === "es")
    assert(got(11L) === "en")
    assert(got(12L) === "und")
  }

  test("GramKeys == composed md5-prefix keys, already distinct per doc") {
    import org.apache.spark.sql.functions._
    val norm = Pipeline.normDocs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.01"))
    for (n <- Seq(3, 8)) {
      val native = Pipeline.hashedShinglesOf(norm, n)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val composed = Pipeline.ngramsOf(norm, n)
        .select(col("doc_id"), Pipeline.hashGram(col("s")).as("s"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(native.length === native.distinct.length, s"n=$n: dup keys emitted")
      assert(native.toSet === composed.toSet, s"n=$n: key sets diverge")
    }
  }

  test("containment flags the excerpt-in-host case that Jaccard misses") {
    val excerpt = "alpha beta gamma delta epsilon zeta eta theta"
    val host = excerpt + " " + (1 to 60).map(i => s"w$i t$i u$i").mkString(" ")
    val docs = Pipeline.normDocs(mkDocs(Seq(
      1L -> excerpt, 2L -> host, 3L -> "totally different words here now")))
    val cont = Pipeline.containmentPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every 3-shingle of the excerpt appears in the host: C(1→2) = 1.0
    assert(cont((1L, 2L)) === 1.0)
    // the symmetric direction is weak (host is much larger)
    assert(!cont.contains((2L, 1L)))
    assert(!cont.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("segmentDedup: earlier occurrence wins, docs rebuilt from survivors") {
    import spark.implicits._
    val s1 = "a" * 200
    val s2 = "b" * 200
    val tail = "c" * 100
    val norm = Seq(
      (1L, s1 + s2),   // both segments first seen here
      (2L, s2 + s1),   // both already seen → doc emptied
      (3L, s1 + tail), // s1 dropped, its own tail kept
    ).toDF("doc_id", "norm")
    val got = Pipeline.segmentDedup(norm).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getLong(1) === 2L && got(1L).getLong(2) === 2L)
    assert(got(1L).getString(4) === md5Hex(s1 + s2))
    assert(got(2L).getLong(2) === 0L && got(2L).getLong(3) === 0L)
    assert(got(2L).getString(4) === md5Hex(""))
    assert(got(3L).getLong(2) === 1L && got(3L).getLong(3) === 100L)
    assert(got(3L).getString(4) === md5Hex(tail))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cdcChunks: repeated content collapses to few unique chunks") {
    import spark.implicits._
    // 'epsilon' / 'merge' / 'green' are anchor words (hashGram % 12 == 0,
    // verified offline); boundaries derive from content, so 8 copies of
    // the same block chunk identically and the unique-chunk count stays at
    // the single block's, while fixed-width chunking would drift out of
    // phase. The trailing non-anchor words form the block's final chunk.
    val block = "the quick brown fox epsilon jumps over the lazy " +
      "merge dog again green with many different words "
    val trimmed = (block * 8).trim
    val docs = Seq(
      (1L, block.trim), (2L, trimmed), (3L, "tiny")).toDF("doc_id", "norm")
    val got = Pipeline.cdcChunks(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val single = got(1L)
    val repeated = got(2L)
    assert(single.getLong(1) === 4L) // 3 anchors + trailing remainder
    // 8 copies: anchors repeat identically; the seam only merges each
    // copy's tail into the next copy's first chunk
    assert(repeated.getLong(1) >= 3 * 8)
    // uniqueness collapses: every interior copy contributes the same chunks
    assert(repeated.getLong(5) <= single.getLong(1) + 2)
    // a one-word doc is a single whole-doc chunk of one word
    assert(got(3L).getLong(1) === 1L && got(3L).getLong(2) === 1L)
    // chunk word-counts partition the document exactly: avg * n == n_words
    val nWords = trimmed.split(" ").length
    assert(math.abs(repeated.getDouble(4) * repeated.getLong(1) - nWords) < 1e-3)
  }

  test("langMixOf: code-switched doc scores ln 2; single-lang doc 0") {
    import spark.implicits._
    // segment 1 = exactly 100 chars of 'the' (en), segment 2 = 'el' (es)
    val switched = ("the " * 25) + ("el " * 32) + "el"
    val norm = Seq(
      (1L, switched),
      (2L, "the the the"),
    ).toDF("doc_id", "norm")
    val got = Pipeline.langMixOf(norm).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 2L)   // n_seg
    assert(got(1L).getInt(2) === 2)     // n_langs
    assert(got(1L).getDouble(3) === math.rint(math.log(2) * 1e6) / 1e6)
    assert(got(1L).getString(4) === "en") // tie → language-name order
    assert(got(1L).getDouble(5) === 0.5)
    assert(got(2L).getInt(2) === 1 && got(2L).getDouble(3) === 0.0)
    assert(got(2L).getString(4) === "en" && got(2L).getDouble(5) === 1.0)
  }

  test("fuzzyTitleJoin: deletion neighborhoods catch del/sub/equal, not dist-2") {
    import spark.implicits._
    val t5 = "abcdefgh rest of title x" // 24 chars -> probe drops the 'h'
    val tc5 = "abcdefg rest of title x" // = t5 minus 8th char (what q152 plants)
    val t7 = "aXcdefg rest of title x" // = tc5 with position 2 substituted
    val norm = Seq(
      (5L, t5), // probe source: tc = tc5
      (7L, t7), // matches tc5 by ONE substitution
      (3L, "completely unrelated here"), // distance >1 from everything
      (10L, t5), // identical title, non-probe id
    ).toDF("doc_id", "norm")
    val pairs = Pipeline.fuzzyTitleJoin(norm).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((5L, 5L)) === 1) // own original via deletion
    assert(pairs((7L, 5L)) === 1) // substitution neighbor found
    assert(pairs((10L, 5L)) === 1) // identical-title doc also distance 1
    assert(!pairs.keySet.exists(_._1 == 3L), s"dist-2 pair leaked: $pairs")
  }
}
