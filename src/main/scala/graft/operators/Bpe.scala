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

  /** Number of merge steps learned/applied by the catalog queries. */
  val K = 6

  /** Corpus word frequencies — the one corpus-scale aggregation. */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(Pipeline.normText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** One learned merge: step index, the merged pair, its pair count. */
  private[graft] final case class Merge(step: Int, a: String, b: String, n: Long)

  /** Run `k` BPE merge iterations over the word-frequency table.
    * Returns the merge table and the final per-word symbol frame
    * (word, cnt, syms). Each iteration's vocab frame is pinned with a
    * blocking localCheckpoint — it is vocab-bounded-tiny, and an unbroken
    * lineage would replay all previous merge steps per iteration.
    */
  private[graft] def learn(s: SparkSession, d: String, k: Int)
      : (Seq[Merge], DataFrame) = {
    var vocab = wordFreq(s, d)
      .withColumn("syms", array_remove(split(col("word"), ""), ""))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var step = 1
    while (step <= k) {
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
      require(top.nonEmpty,
        s"BPE ran dry at step $step: no adjacent pairs left (k=$k too large)")
      val (a, b, n) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += Merge(step, a, b, n)
      vocab = vocab
        .withColumn("syms",
          graft.functions.BpeMergeStep(col("syms"), lit(a), lit(b)))
        .localCheckpoint(true)
      step += 1
    }
    (merges.result(), vocab)
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

  val all: Seq[Q] = Seq(q177BpeMerges, q178BpeApply)
}
