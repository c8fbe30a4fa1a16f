package graft.operators

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over the document corpus — the
  * canonical LLM tokenizer-training primitive (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"; the
  * same merge loop underlies GPT-2/SentencePiece BPE trainers).
  *
  * Scale shape (the part that matters at 100 TB): the ONLY corpus-scale
  * pass is the word-frequency aggregation — one map-side-combinable
  * groupBy whose output is VOCABULARY-bounded (Zipf: ~10M rows at 100 TB,
  * independent of corpus row count). Every merge iteration then runs on
  * that vocab-bounded frame: adjacent-pair counts re-aggregate ≤|vocab|·L
  * rows, the argmax is a 1-row driver collect (the q157 driver-local
  * stance — per-iteration state is one (a, b) pair, never data-sized),
  * and the merge applies map-side via the native
  * [[graft.functions.BpeMergeStep]] expression. k iterations = k tiny
  * jobs after one corpus shuffle; a formulation that re-tokenized the
  * CORPUS per iteration would instead pay k full-scale passes.
  *
  * Both engines break pair-count ties identically (count DESC, then pair
  * lexicographically), so the learned merge table is deterministic and
  * the DuckDB oracle reproduces it exactly — the oracle unrolls the k
  * merge levels with a left-fold merge application whose greedy
  * semantics match BpeMergeStep symbol for symbol.
  */
object Bpe {

  /** Number of merge steps learned/applied by the small catalog queries. */
  val K = 6

  /** Realistic-tokenizer merge budget for q179/q180. Real vocabularies
    * run 10³–10⁵ merges; 256 is enough to exercise the driver-trainer
    * path at depth while staying test-budget-sane. On corpora whose pair
    * diversity runs out earlier (every word fully merged — the sf0.001/
    * sf0.01 fixtures, 31-word vocab), training stops at exhaustion like
    * any real BPE trainer: the vocab size is a MAXIMUM, not a promise.
    */
  val K256 = 256

  /** Vocab-row cap under which training runs driver-side (the q34
    * gated-driver stance): the word-frequency table is VOCABULARY-bounded
    * at any corpus size (Zipf: ~10M rows at 100 TB), and a 4M-row vocab
    * is ~400 MB of (word, syms, cnt) — driver-sized. Below the cap, one
    * collect + an in-memory pair-count heap replaces K (argmax job +
    * vocab checkpoint) rounds — the difference between 2 jobs and 512 at
    * K=256. Past the cap, the distributed per-step loop (unchanged)
    * carries arbitrary vocabularies; a conf-planted spec pins the two
    * paths equal.
    */
  val DriverVocabCapConf = "graft.bpe.driverVocabCap"
  val DefaultDriverVocabCap = 4000000L

  /** Corpus word frequencies — the one corpus-scale aggregation. */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(Pipeline.normText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** One learned merge: step index, the merged pair, its pair count. */
  private[graft] final case class Merge(step: Int, a: String, b: String, n: Long)

  /** Run up to `k` BPE merge iterations over the word-frequency table —
    * stopping early (like any real trainer) if the corpus runs out of
    * adjacent pairs. Returns the merge table and the final per-word
    * symbol frame (word, cnt, syms).
    *
    * Route: ONE corpus-scale aggregation builds the vocab-bounded
    * word-frequency frame; when its row count is under
    * [[DriverVocabCapConf]] the whole merge loop runs driver-side on a
    * pair-count heap ([[trainDriver]] — 0 further jobs); past the cap the
    * distributed per-step loop ([[learnDistributed]]) takes over. Both
    * paths share tie-breaks (count DESC, then pair lexicographically) and
    * greedy-scan merge semantics, so the learned table is identical —
    * pinned by BpeSpec's conf-planted equality test.
    */
  private[graft] def learn(s: SparkSession, d: String, k: Int)
      : (Seq[Merge], DataFrame) = {
    val vocab0 = wordFreq(s, d)
      .withColumn("syms", array_remove(split(col("word"), ""), ""))
      .localCheckpoint(true)
    val cap = s.conf.get(DriverVocabCapConf, DefaultDriverVocabCap.toString).toLong
    // count() on the checkpointed vocab frame is partition-metadata cheap
    if (vocab0.count() <= cap) {
      val rows = vocab0.select("word", "cnt", "syms").collect()
      val words = rows.map { r =>
        (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray)
      }
      val (merges, trained) = trainDriver(words, k)
      val outRows = trained.toSeq.map { case (w, c, sy) => (w, c, sy.toSeq) }
      (merges, s.createDataFrame(outRows).toDF("word", "cnt", "syms"))
    } else learnDistributed(vocab0, k)
  }

  /** Distributed merge loop: K rounds of (vocab-bounded pair-count argmax
    * job + map-side BpeMergeStep + blocking localCheckpoint). The
    * checkpoint pins each iteration's tiny frame — an unbroken lineage
    * would replay every previous merge step per iteration.
    */
  private[graft] def learnDistributed(vocab0: DataFrame, k: Int)
      : (Seq[Merge], DataFrame) = {
    var vocab = vocab0
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var dry = false
    while (step <= k && !dry) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, a, b, n)
        vocab = vocab
          .withColumn("syms",
            graft.functions.BpeMergeStep(col("syms"), lit(a), lit(b)))
          .localCheckpoint(true)
        step += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Driver-side BPE trainer over the collected vocab — the classic
    * pair-count-heap algorithm (Sennrich et al.'s trainer with the
    * incremental-update optimization every production implementation
    * uses): pair counts and a pair→words index are built once; each merge
    * pops the heap max (count DESC, pair lex ASC — identical tie-break to
    * the distributed argmax), rewrites ONLY the words containing the pair
    * via the same greedy scan as BpeMergeStep, and pushes the changed
    * counts back. Heap entries are validated lazily against the live
    * count map, so stale entries from earlier updates are discarded on
    * pop rather than searched for. Cost: O(Σ touched-word lengths) per
    * merge instead of a full vocab pass — and zero Spark jobs.
    */
  private[graft] def trainDriver(
      words: Array[(String, Long, Array[String])], k: Int)
      : (Seq[Merge], Array[(String, Long, Array[String])]) = {
    import scala.collection.mutable
    val syms = words.map(_._3.clone())
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // heap order: count DESC, then a ASC, b ASC — the distributed
    // orderBy(n.desc, a, b) exactly. ASC here must be Spark's string
    // order, which is UTF8String BINARY order = UTF-8 byte order = code
    // POINT order; Java's String.compareTo is UTF-16 code-UNIT order and
    // diverges on supplementary-plane symbols (a surrogate pair's lead
    // unit 0xD800-0xDBFF sorts below BMP chars in 0xE000-0xFFFF, so e.g.
    // U+1F600 < U+FFFD under compareTo but > under Spark). A tied pair
    // count on such symbols would make the two trainers learn different
    // merge tables, violating the paths-identical contract (ADVICE r12).
    def cpCompare(x: String, y: String): Int = {
      var i = 0; var j = 0
      while (i < x.length && j < y.length) {
        val cx = x.codePointAt(i); val cy = y.codePointAt(j)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx); j += Character.charCount(cy)
      }
      Integer.compare(x.length - i, y.length - j)
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(16, words.length),
      (x: (Long, String, String), y: (Long, String, String)) => {
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
        else {
          val ca = cpCompare(x._2, y._2)
          if (ca != 0) ca else cpCompare(x._3, y._3)
        }
      })
    def addPair(a: String, b: String, c: Long, wi: Int): Unit = {
      val key = (a, b)
      val n = pairCount.getOrElse(key, 0L) + c
      pairCount(key) = n
      pairWords.getOrElseUpdate(key, mutable.HashSet.empty) += wi
      heap.add((n, a, b))
    }
    def subPair(a: String, b: String, c: Long): Unit = {
      val key = (a, b)
      val n = pairCount.getOrElse(key, 0L) - c
      if (n <= 0L) pairCount.remove(key)
      else { pairCount(key) = n; heap.add((n, a, b)) }
    }
    var wi = 0
    while (wi < syms.length) {
      val w = syms(wi); val c = words(wi)._2
      var i = 0
      while (i + 1 < w.length) { addPair(w(i), w(i + 1), c, wi); i += 1 }
      wi += 1
    }
    def mergeWord(w: Array[String], a: String, b: String): Array[String] = {
      val out = new Array[String](w.length)
      var o = 0; var i = 0
      val ab = a + b
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { out(o) = ab; i += 2 }
        else { out(o) = w(i); i += 1 }
        o += 1
      }
      if (o == w.length) out else java.util.Arrays.copyOf(out, o)
    }
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var dry = false
    while (step <= k && !dry) {
      // pop until an entry matches its LIVE count (lazy invalidation)
      var top: (Long, String, String) = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCount.get((e._2, e._3)).contains(e._1)) top = e
      }
      if (top == null) dry = true
      else {
        val (n, a, b) = top
        merges += Merge(step, a, b, n)
        // rewrite only the words indexed under (a, b); the index can hold
        // stale members (word since rewritten past the pair) — the
        // contains-scan inside mergeWord makes those no-ops
        val affected = pairWords.remove((a, b)).getOrElse(mutable.HashSet.empty)
        pairCount.remove((a, b))
        affected.toArray.sorted.foreach { i =>
          val w = syms(i); val c = words(i)._2
          val m = mergeWord(w, a, b)
          if (m.length != w.length) {
            var j = 0
            while (j + 1 < w.length) { subPair(w(j), w(j + 1), c); j += 1 }
            // the merged pair's own count entry was dropped above; subPair
            // may have re-added fragments — drop again to stay exact
            pairCount.remove((a, b))
            j = 0
            while (j + 1 < m.length) { addPair(m(j), m(j + 1), c, i); j += 1 }
            syms(i) = m
          }
        }
        step += 1
      }
    }
    (merges.result(), words.indices.map(i =>
      (words(i)._1, words(i)._2, syms(i))).toArray)
  }

  /** Oracle-side word-frequency CTEs (shared by both queries). */
  private def sqlWordFreq: String = s"""
      nrm AS (SELECT ${Pipeline.sqlNorm("text")} AS n FROM documents),
      w AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(n, ' ')) AS word FROM nrm)
            WHERE word != '' GROUP BY word),
      s0 AS (SELECT cnt, string_split(word, '') AS syms FROM w)"""

  /** One unrolled oracle merge level: pair counts from s{i-1}, argmax
    * m{i}, and s{i} with the merge applied via a left fold over
    * singleton-wrapped symbols (fold semantics ≡ BpeMergeStep's greedy
    * scan — see that expression's doc for the equivalence argument).
    */
  private def sqlLevel(i: Int): String = {
    val prev = s"s${i - 1}"
    s"""
      p$i AS (SELECT u.pair[1] AS a, u.pair[2] AS b,
                     CAST(sum(cnt) AS BIGINT) AS n
              FROM $prev, unnest(list_zip(syms, syms[2:len(syms)])) AS u(pair)
              WHERE u.pair[2] IS NOT NULL GROUP BY 1, 2),
      m$i AS (SELECT CAST($i AS INT) AS step, a, b, n FROM p$i
              ORDER BY n DESC, a, b LIMIT 1),
      s$i AS (SELECT cnt,
                list_reduce(list_transform(syms, s -> [s]),
                  (acc, x) -> CASE WHEN acc[-1] = a AND x[1] = b
                     THEN list_append(acc[1:len(acc)-1], a || b)
                     ELSE list_concat(acc, x) END) AS syms
              FROM $prev, m$i)"""
  }

  private def sqlLevels(k: Int): String =
    (1 to k).map(sqlLevel).mkString(",")

  /** q177 — the learned merge table itself: (step, a, b, n) for K greedy
    * merges. The engine's table is collected from K 1-row argmax jobs
    * over the vocab-bounded pair counts; the oracle unrolls the same K
    * levels in SQL.
    */
  val q177BpeMerges = Q(
    "q177_bpe_merges",
    (s, d) => {
      val (merges, _) = learn(s, d, K)
      s.createDataFrame(merges).toDF("step", "a", "b", "n")
    },
    Some(s"""
      WITH $sqlWordFreq, ${sqlLevels(K)}
      SELECT step, a, b, n
      FROM (${(1 to K).map(i => s"SELECT * FROM m$i")
        .mkString(" UNION ALL ")})
      ORDER BY step
    """),
  )

  /** q178 — apply the learned merges: corpus token frequencies under the
    * K-merge tokenizer, top 20 tokens. Tokenization runs on the VOCAB
    * (each distinct word tokenized once, weighted by its corpus count) —
    * the standard trainer trick that keeps the apply pass
    * vocabulary-bounded instead of re-walking the corpus.
    */
  val q178BpeApply = Q(
    "q178_bpe_apply",
    (s, d) => {
      val (_, vocab) = learn(s, d, K)
      vocab
        .select(col("cnt"), explode(col("syms")).as("token"))
        .groupBy("token")
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },
    Some(s"""
      WITH $sqlWordFreq, ${sqlLevels(K)}
      SELECT token, CAST(sum(cnt) AS BIGINT) AS n
      FROM (SELECT cnt, unnest(syms) AS token FROM s$K)
      GROUP BY token ORDER BY n DESC, token LIMIT 20
    """),
  )

  /** q179 — realistic-depth training: up to [[K256]] merges. No SQL
    * oracle: 256 unrolled CTE levels are impractical for DuckDB (each
    * level references the previous twice, so without forced
    * materialization the inlined plan is exponential), so the driver
    * records the rows-only check; the hash-strength differential lives in
    * BpeSpec — an independent from-scratch brute-force trainer (full pair
    * recount per step, no heap, no incremental updates) must reproduce
    * the merge table exactly, and a conf-planted cap pins the distributed
    * loop to the same table.
    *
    * Driver-visible contract (VERDICT r12 #5 — rows-only was too weak to
    * catch a merge-table regression): the query SELF-CHECKS two
    * invariants and `require`-fails loudly on violation, so the driver's
    * gate records an error instead of a green row count:
    *   1. `n_monotone_ok` — the greedy argmax sequence is non-increasing
    *      in n (merging the max pair only creates pairs whose count is
    *      bounded by the merged count and shrinks others), so any
    *      corruption of the heap's incremental updates that inflates a
    *      later count trips it;
    *   2. `encode_consistent` — re-encoding EVERY vocab word from raw
    *      characters through the rank-lookup encoder
    *      ([[graft.functions.BpeEncode]], an independent greedy-merge
    *      implementation) must reproduce the trainer's final symbol
    *      state. Runs at every SF, unlike the fixture-bound BpeSpec pin.
    */
  val q179BpeMerges256 = Q(
    "q179_bpe_merges_k256",
    (s, d) => {
      val (merges, vocab) = learn(s, d, K256)
      val monoFlags = true +: merges.zip(merges.drop(1))
        .map { case (p, q) => q.n <= p.n }
      require(monoFlags.forall(identity),
        "q179 contract violated: merge pair counts not monotone non-increasing")
      val table = merges.map(m => m.a + " " + m.b).toArray
      val mismatches = vocab.filter(
        graft.functions.BpeEncode(
          array_remove(split(col("word"), ""), ""), table) =!= col("syms"))
        .count()
      require(mismatches == 0L,
        s"q179 contract violated: $mismatches vocab words re-encode differently from the trainer's final state")
      // output IS the learned merge table, one row per step ordered by
      // step with its (pair, rank=n) — so the driver's rows+schema check
      // pins the table's SHAPE (row count = K256 at every SF past vocab
      // saturation, 6 fixed columns) even though the hash check stays off
      // (VERDICT r13 #3; COVERAGE.md documents why DuckDB cannot recompute
      // the values at K=256)
      s.createDataFrame(merges.zip(monoFlags).map { case (m, ok) =>
        (m.step, m.a, m.b, m.n, ok, mismatches == 0L)
      }).toDF("step", "a", "b", "n", "n_monotone_ok", "encode_consistent")
        .orderBy(col("step"))
    },
    None,
  )

  /** q180 — tokenize under the K256-merge table via the map-side
    * rank-lookup encoder ([[graft.functions.BpeEncode]]): corpus token
    * frequencies, top 30. The encode runs on the VOCAB (each distinct
    * word once, weighted by corpus count) — but unlike q178, which reads
    * the trainer's own final symbol state, this RE-TOKENIZES from raw
    * characters through the rank loop, the path a production pipeline
    * takes when applying a shipped tokenizer to new text; BpeSpec pins
    * encode(word) == trainer-final-state per word, and at corpus scale
    * the same expression applies per-document with the vocab shortcut
    * unavailable (one map-side pass, zero shuffles, zero jobs per merge).
    *
    * Driver-visible contract (VERDICT r12 #5): `chars_conserved` — the
    * encoder PARTITIONS each word's characters, so token lengths weighted
    * by frequency must exactly conserve the corpus's word characters
    * (Σ n·len(token) over the FULL pre-limit token table ==
    * Σ cnt·len(word) over the vocab). A dropped/duplicated/garbled token
    * anywhere in the encode pass breaks the equality; the query
    * `require`-fails loudly, so the driver's rows-only gate sees an error
    * rather than a green row count. The word/cnt inputs reuse [[learn]]'s
    * returned (checkpointed) vocab frame — same content as a fresh
    * [[wordFreq]], zero extra corpus passes.
    */
  val q180BpeEncode256 = Q(
    "q180_bpe_encode_k256",
    (s, d) => {
      val (merges, vocab) = learn(s, d, K256)
      val table = merges.map(m => m.a + " " + m.b).toArray
      // checkpointed: BOTH the conservation aggregate and the final top-30
      // consume it, and an unbroken lineage would run the BpeEncode pass
      // over the vocab twice (ADVICE r13)
      val tokFreq = vocab
        .select(col("cnt"),
          explode(graft.functions.BpeEncode(
            array_remove(split(col("word"), ""), ""), table)).as("token"))
        .groupBy("token")
        .agg(sum(col("cnt")).as("n"))
        .localCheckpoint(true)
      // sum() over zero rows is NULL — read nullable so an empty corpus
      // fails with the contract message, not a bare NPE (ADVICE r13)
      def sumOrFail(df: org.apache.spark.sql.DataFrame, what: String): Long =
        Option(df.first().getAs[java.lang.Long](0)).map(_.longValue).getOrElse(
          sys.error(s"q180 contract unmeasurable: $what sum is NULL — empty corpus/vocab"))
      val tokChars = sumOrFail(
        tokFreq.agg(sum(col("n") * length(col("token")))), "encoded token chars")
      val wordChars = sumOrFail(
        vocab.agg(sum(col("cnt") * length(col("word")))), "corpus word chars")
      require(tokChars == wordChars,
        s"q180 contract violated: encoded token chars $tokChars != corpus word chars $wordChars")
      tokFreq
        .orderBy(col("n").desc, col("token"))
        .limit(30)
        .withColumn("chars_conserved", lit(tokChars == wordChars))
    },
    None,
  )

  val all: Seq[Q] =
    Seq(q177BpeMerges, q178BpeApply, q179BpeMerges256, q180BpeEncode256)
}
