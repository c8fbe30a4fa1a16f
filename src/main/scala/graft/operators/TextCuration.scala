package graft.operators

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation text analysis — the quality/cleaning signals an LLM
  * training pipeline computes per document before filtering: repetition
  * metrics (Gopher-style), PII redaction, and tf-idf keyword extraction.
  * All deterministic and oracle-checked; every operator is an equi-join /
  * map-side pipeline whose shuffle keys (doc_id, word) are the natural
  * partitioning at 100 TB.
  *
  * Extends the reference's text surface (its only text machinery is the RAG
  * chunker, `api/ingest_docs.py:44-62`) per the builder brief's
  * training-data-pipeline mandate.
  */
object TextCuration {

  private val sqlNorm = Pipeline.sqlNorm

  private def docsNorm(s: SparkSession, d: String): DataFrame =
    Pipeline.normDocs(Tables.documents(s, d))

  /** Per-document repetition metrics (the Gopher/RefinedWeb quality
    * signals): token counts, distinct-token ratio inputs, the share of the
    * single most frequent token, and the fraction of duplicated 5-grams.
    * Entirely SHUFFLE-FREE: token frequencies come from the native
    * [[graft.functions.TokenFreqStats]] (one hash-map pass per doc) and
    * the distinct-5-gram count is the size of [[graft.functions.GramKeys]]'
    * per-doc key set — the earlier explode → groupBy(doc, word) chain
    * shuffled the corpus token count twice for per-doc answers. Docs with
    * <5 words have no 5-grams: dup5_frac is null there (mirrored via
    * NULLIF in the oracle).
    */
  def repetitionMetrics(norm: DataFrame): DataFrame =
    norm
      .select(col("doc_id"), split(col("norm"), " ").as("ws"))
      .select(
        col("doc_id"),
        graft.functions.TokenFreqStats(col("ws")).as("tf"),
        greatest(size(col("ws")) - 4, lit(0)).cast("long").as("g5_total"),
        size(graft.functions.GramKeys(col("ws"), 5)).cast("long").as("g5_distinct"))
      .select(
        col("doc_id"),
        col("tf.n_tokens").as("n_tokens"),
        col("tf.n_distinct").as("n_distinct"),
        round(col("tf.max_tf") / col("tf.n_tokens"), 6).as("top_token_share"),
        round((col("g5_total") - col("g5_distinct")) /
          nullif(col("g5_total"), lit(0L)), 6).as("dup5_frac"))

  val q101RepMetrics = Q(
    "q101_rep_metrics",
    (s, d) => repetitionMetrics(docsNorm(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM norm),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
      tok AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct, max(tf) AS max_tf
        FROM tf GROUP BY doc_id),
      words AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
      g AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS s
        FROM words CROSS JOIN (SELECT CAST(unnest(range(1,
          1 + (SELECT max(len(ws)) FROM words))) AS INT) AS i) r
        WHERE len(ws) >= 5 AND i <= len(ws) - 4),
      g5 AS (SELECT doc_id, count(DISTINCT ${Pipeline.sqlHashGram("s")}) AS g5_distinct
             FROM g GROUP BY doc_id),
      base AS (
        SELECT doc_id, CAST(greatest(len(string_split(norm, ' ')) - 4, 0) AS BIGINT) AS g5_total
        FROM norm)
      SELECT base.doc_id, n_tokens, n_distinct,
             round(max_tf * 1.0 / n_tokens, 6) AS top_token_share,
             round((g5_total - coalesce(g5_distinct, 0)) * 1.0
                   / nullif(g5_total, 0), 6) AS dup5_frac
      FROM base
      JOIN tok ON base.doc_id = tok.doc_id
      LEFT JOIN g5 ON base.doc_id = g5.doc_id
    """),
  )

  /** Email / phone patterns — ASCII-only so Java regex (Spark) and RE2
    * (DuckDB) agree byte-for-byte on the synthetic corpus.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b555-[0-9]+\\b"

  /** PII scrub — count and redact email/phone occurrences. The catalog
    * query first APPENDS two synthetic emails and a phone number derived
    * from doc_id (both engines construct the identical string), so the
    * regex path is genuinely exercised: a broken pattern shifts every
    * count and every scrub hash, not just rows that happen to contain PII.
    * Pure map-side (regexp_extract_all + regexp_replace in whole-stage
    * codegen); emits md5 of the scrubbed text so the oracle verifies the
    * full replacement output without shipping long strings.
    */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or user"), col("doc_id"),
          lit("@mail.example.org call 555-"), col("doc_id") % 10000,
          lit(" now")).as("txt"))
      // one native codegen expression instead of four regex traversals
      // (2× extract_all + 2× replace) — semantics proven regex-equal in
      // PiiStatsSpec; the DuckDB oracle still runs the regex formulation
      .select(col("doc_id"), graft.functions.PiiStats(col("txt")).as("p"))
      .select(
        col("doc_id"),
        col("p.n_emails").as("n_emails"),
        col("p.n_phones").as("n_phones"),
        md5(col("p.scrubbed")).as("scrub_hash"))

  val q102PiiScrub = Q(
    "q102_pii_scrub",
    (s, d) => piiScrub(Tables.documents(s, d)),
    Some(s"""
      WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or user'
                    || doc_id || '@mail.example.org call 555-'
                    || (doc_id % 10000) || ' now' AS txt
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt, '$EmailRe')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS INT) AS n_phones,
             md5(regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS scrub_hash
      FROM aug
    """),
  )

  /** Top-k tf-idf terms per document — the keyword-extraction primitive
    * (dedup cluster naming, topic tagging, index keys). idf is the raw
    * inverse document frequency N/df: tf, N, and df are small exact
    * integers, so score = tf·N/df is one IEEE-correctly-rounded division in
    * both engines — bit-identical, unlike ln-based idf where libm ulp
    * drift could flip a rounding or a rank. Plan shape: per-doc tf
    * (doc-keyed groupBy), corpus df (word-keyed groupBy, map-side
    * combinable — a stop word reduces per partition before the shuffle),
    * one equi-join on the word, and a per-doc top-k window. At 100 TB the
    * df frame is vocabulary-sized (≪ corpus) and the join key is the word:
    * no skew beyond stop words, which map-side combine already collapsed.
    */
  def tfidfTerms(norm: DataFrame, k: Int): DataFrame = {
    // tf map-side via the native TokenFreqMap: rows leave the scan already
    // reduced to distinct (doc, term) pairs — no corpus-wide groupBy.
    // Materialized once: both the df aggregation and the scoring join
    // consume it, and without the checkpoint each replays the scan +
    // tokenize + explode lineage (measured 2.6 → 2.2 s at sf1).
    val tf = norm
      .select(col("doc_id"),
        explode(graft.functions.TokenFreqMap(split(col("norm"), " "))))
      .withColumnRenamed("key", "term")
      .withColumnRenamed("value", "tf")
      .localCheckpoint(true)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = norm.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("tfidf"))
  }

  val q104TfidfTerms = Q(
    "q104_tfidf_terms",
    (s, d) => tfidfTerms(docsNorm(s, d), 3),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM norm),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM norm),
      scored AS (
        SELECT doc_id, term, tf.tf, df.df,
               (tf.tf * n.n_docs) * 1.0 / df.df AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
             round(score, 6) AS tfidf
      FROM ranked WHERE rank <= 3
    """),
  )

  /** Heavy hitters via a deterministic 1/16 document sample — the third
    * member of the sketch family (q44 HLL distinct, q90 approx
    * percentile): estimate corpus-wide term counts from a fixed md5
    * sample and scale by 16. The sample is a pure function of doc_id, so
    * the estimate is reproducible on any cluster/partitioning and the
    * oracle recomputes it exactly; the accuracy CONTRACT (estimate within
    * 50% of exact for every term with exact support ≥ 200) is a data
    * column both engines must agree on — q44's pattern. At 100 TB the
    * exact side is the expensive one; a real pipeline keeps only the
    * sampled scan (1/16 of the corpus read) and this query is the audit
    * that the estimator is trustworthy at the support floor.
    */
  val SupportFloor = 200

  def heavyHitters(norm: DataFrame, k: Int): DataFrame = {
    val tf = norm
      .select(col("doc_id"),
        explode(graft.functions.TokenFreqMap(split(col("norm"), " "))))
      .withColumnRenamed("key", "term")
      .withColumnRenamed("value", "tf")
    val exact = tf.groupBy("term").agg(sum(col("tf")).as("exact_n"))
      .filter(col("exact_n") >= SupportFloor)
    val est = tf
      .filter(substring(md5(concat(lit("hh-"), col("doc_id").cast("string"))), 1, 1) === "0")
      .groupBy("term").agg((sum(col("tf")) * 16).as("est_n"))
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject: distributed
    // partial top-k, never a single-task window over the whole vocabulary)
    // — the rank window then runs over exactly k rows
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("exact_n").desc, col("term"))
    exact.join(est, Seq("term"), "left")
      .select(col("term"), col("exact_n"),
        coalesce(col("est_n"), lit(0L)).as("est_n"))
      .orderBy(col("exact_n").desc, col("term"))
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("term"), col("rank"), col("exact_n"), col("est_n"),
        (abs(col("est_n") - col("exact_n")) / col("exact_n") <= 0.5)
          .as("est_within_50pct"))
  }

  val q111HeavyHitters = Q(
    "q111_heavy_hitters",
    (s, d) => heavyHitters(docsNorm(s, d), 20),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM norm),
      exact AS (
        SELECT term, count(*) AS exact_n FROM w
        GROUP BY term HAVING count(*) >= $SupportFloor),
      est AS (
        SELECT term, count(*) * 16 AS est_n FROM w
        WHERE substr(md5('hh-' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        GROUP BY term),
      ranked AS (
        SELECT exact.term, exact_n,
               CAST(coalesce(est_n, 0) AS BIGINT) AS est_n,
               row_number() OVER (ORDER BY exact_n DESC, exact.term) AS rank
        FROM exact LEFT JOIN est ON exact.term = est.term)
      SELECT term, CAST(rank AS INT) AS rank,
             CAST(exact_n AS BIGINT) AS exact_n, est_n,
             abs(est_n - exact_n) * 1.0 / exact_n <= 0.5 AS est_within_50pct
      FROM ranked WHERE rank <= 20
    """),
  )

  /** Exact interpolated percentile bounds (quantile_cont semantics:
    * position `p*(n-1)` over the sorted column, linear interpolation)
    * computed WITHOUT the single-buffer exact `percentile` aggregate.
    * Spark's `percentile` is a TypedImperativeAggregate that merges a
    * value→count map of the whole column into ONE final task — an
    * O(distinct-values) single-point buffer that was the suite's one
    * scale-killer. This form is TWO distributed scans, every aggregate
    * partial/mergeable:
    *
    *   1. `count` + a mergeable `approx_percentile` sketch probed just
    *      below/above each target percentile → a value BRACKET whose rank
    *      coverage is guaranteed by the sketch's rank-error bound
    *      (error ≤ n/accuracy; probes at p ± w with w·n − n/acc ≥ 2 for
    *      all n ≥ `SmallN`, and below `SmallN` the bracket widens to the
    *      whole column, where the histogram is trivially small anyway).
    *   2. A bucketed value histogram: rows below/between/above the
    *      brackets collapse to one partial-aggregated counter each; only
    *      in-bracket values keep their identity. The histogram is ≤
    *      ~2·w·n ranks' worth of distinct values, so the single-partition
    *      cumulative-sum window over it is sketch-bounded, not O(n).
    *   3. The exact order statistics at ranks ⌊p(n−1)⌋ and ⌊p(n−1)⌋+1 are
    *      read off the cumulative counts, and the interpolation runs in
    *      exact DECIMAL arithmetic: the column carries 2 decimals and p
    *      has 2 decimals, so `A + d·(B−A)` is exact rational math — the
    *      oracle computes the identical decimals, making the bound
    *      bit-identical across engines (no float-ulp fragility at values
    *      that coincide with a bound).
    *
    * Returns a 1-row (lo, hi) frame for broadcast.
    */
  /** Step 2's bucketed cells, optionally keyed by extra grouping columns
    * (so a downstream aggregate can reuse the SAME scan): one row per
    * (extra keys ×) bucket × in-bracket value, carrying the cell count,
    * the cell's exact-decimal value sum, and the column count n.
    */
  private[graft] def winsorCells(
      li: DataFrame, c: String, extra: Seq[String]): DataFrame = {
    // Acc trades sketch-merge cost against bracket width: the final merge
    // task handles O(partitions · summary) entries, and acc=1e5 measured
    // 5.5 s at sf1 vs 0.96 s for Spark's default 1e4 — so keep the default
    // and widen the bracket instead. Coverage: w·n − n/Acc ≥ 2 for all
    // n ≥ SmallN (margin ≥ 40 ranks at the cutoff); the bracket histogram
    // is ≤ ~2·w·n ranks ≈ 0.1% of the column, whose distinct 2-decimal
    // values stay window-safe. For an all-distinct column at extreme n,
    // raise Acc and shrink W by the same factor — the guarantee holds.
    val Acc = 10000 // sketch rank error <= n/Acc
    val W = 5e-4 // bracket half-width in percentile space
    val SmallN = 100000L // below this, skip the bracket: whole column is the histogram
    val probes = Seq(0.01 - W, 0.01 + W, 0.99 - W, 0.99 + W)
    val stats = li.agg(
      count(col(c)).as("n"),
      expr(s"approx_percentile($c, array(${probes.mkString(",")}), $Acc)").as("pr"))
      .select(col("n"), col("pr")(0).as("lo_lb"), col("pr")(1).as("lo_ub"),
        col("pr")(2).as("hi_lb"), col("pr")(3).as("hi_ub"))
    val v = col("v")
    li.select((extra.map(col) :+ col(c).as("v")): _*)
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("n") < SmallN, lit(1))
          .when(v < col("lo_lb"), lit(0))
          .when(v <= col("lo_ub"), lit(1))
          .when(v < col("hi_lb"), lit(2))
          .when(v <= col("hi_ub"), lit(3))
          .otherwise(lit(4)))
      .groupBy((extra.map(col) :+ col("bucket") :+
        when(col("bucket") === 1 || col("bucket") === 3, v).as("bv")): _*)
      .agg(count(lit(1)).as("cnt"),
        graft.core.Num.dsumDec(v).as("vsum"),
        max(col("n")).as("n"))
  }

  /** Step 3: exact bounds read off the cumulative cell counts. Accepts
    * cells from [[winsorCells]] with any extra keys (they are collapsed
    * first). Returns the 1-row (lo, hi) frame for broadcast.
    */
  private[graft] def boundsFromCells(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val collapsed = cells.groupBy(col("bucket"), col("bv"))
      .agg(sum(col("cnt")).as("cnt"), max(col("n")).as("n"))
    // cumulative count ordered by value (bucket order IS value order; the
    // window input is the sketch-bounded histogram, never the raw column)
    val ranked = collapsed.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"), col("bv"))))
    val money = graft.core.Num.Money
    def pos(p: String) =
      (col("n") - 1).cast(org.apache.spark.sql.types.DecimalType(20, 0)) *
        lit(new java.math.BigDecimal(p))
    def k(p: String) = floor(pos(p)).cast("long")
    def frac(p: String) =
      (pos(p) - floor(pos(p))).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    def vAt(r: Column) = min(when(col("cum") >= r, col("bv")))
    def interp(a: String, b: String, d: String) =
      (col(a) + col(d) * (coalesce(col(b), col(a)) - col(a))).cast("double")
    ranked.agg(
      vAt(k("0.01") + 1).cast(money).as("loA"),
      vAt(k("0.01") + 2).cast(money).as("loB"),
      vAt(k("0.99") + 1).cast(money).as("hiA"),
      vAt(k("0.99") + 2).cast(money).as("hiB"),
      max(frac("0.01")).as("dLo"),
      max(frac("0.99")).as("dHi"))
      .select(interp("loA", "loB", "dLo").as("lo"),
        interp("hiA", "hiB", "dHi").as("hi"))
  }

  private[graft] def winsorBounds(li: DataFrame, c: String): DataFrame =
    boundsFromCells(winsorCells(li, c, Nil))

  /** PER-GROUP variant of the bracket technique — exact per-key p01/p99
    * without a per-group value buffer: one grouped sketch pass yields each
    * group's own bracket (probes at p ± W) PLUS the contract's direct
    * sketch estimates (p itself rides in the same probe array, so the
    * sketch is built once); a broadcast join keys every row to ITS group's
    * bracket; cells group by (keys, bucket, value-in-bracket). Groups
    * below `SmallN` take the full-histogram path on their own rows (their
    * per-group n drives the CASE), so the coverage guarantee
    * w·n_g − n_g/Acc ≥ 2 holds for every group. Cells carry (cnt, vsum,
    * n, alo, ahi) per group.
    */
  private[graft] def groupWinsorCells(
      li: DataFrame, c: String, keys: Seq[String]): DataFrame = {
    val Acc = 10000
    val W = 5e-4
    val SmallN = 100000L
    val probes = Seq(0.01 - W, 0.01, 0.01 + W, 0.99 - W, 0.99, 0.99 + W)
    val stats = li.groupBy(keys.map(col): _*).agg(
      count(col(c)).as("n"),
      expr(s"approx_percentile($c, array(${probes.mkString(",")}), $Acc)").as("pr"))
      .select((keys.map(col) :+ col("n") :+
        col("pr")(0).as("lo_lb") :+ col("pr")(1).as("alo") :+
        col("pr")(2).as("lo_ub") :+ col("pr")(3).as("hi_lb") :+
        col("pr")(4).as("ahi") :+ col("pr")(5).as("hi_ub")): _*)
    val v = col("v")
    li.select((keys.map(col) :+ col(c).as("v")): _*)
      .join(broadcast(stats), keys) // group cardinality is small: broadcast
      .withColumn("bucket",
        when(col("n") < SmallN, lit(1))
          .when(v < col("lo_lb"), lit(0))
          .when(v <= col("lo_ub"), lit(1))
          .when(v < col("hi_lb"), lit(2))
          .when(v <= col("hi_ub"), lit(3))
          .otherwise(lit(4)))
      .groupBy((keys.map(col) :+ col("bucket") :+
        when(col("bucket") === 1 || col("bucket") === 3, v).as("bv")): _*)
      .agg(count(lit(1)).as("cnt"),
        graft.core.Num.dsumDec(v).as("vsum"),
        max(col("n")).as("n"),
        max(col("alo")).as("alo"), max(col("ahi")).as("ahi"))
  }

  /** Per-group exact bounds off the grouped cells: the cumulative-count
    * window partitions BY GROUP (parallel across keys, sketch-bounded
    * within each), then the same exact-decimal interpolation per group.
    * Returns (keys..., lo, hi).
    */
  private[graft] def groupBoundsFromCells(
      cells: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = cells.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(keys.map(col): _*)
        .orderBy(col("bucket"), col("bv"))))
    val money = graft.core.Num.Money
    def pos(p: String) =
      (col("n") - 1).cast(org.apache.spark.sql.types.DecimalType(20, 0)) *
        lit(new java.math.BigDecimal(p))
    def k(p: String) = floor(pos(p)).cast("long")
    def frac(p: String) =
      (pos(p) - floor(pos(p))).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    def vAt(r: Column) = min(when(col("cum") >= r, col("bv")))
    def interp(a: String, b: String, d: String) =
      (col(a) + col(d) * (coalesce(col(b), col(a)) - col(a))).cast("double")
    ranked.groupBy(keys.map(col): _*)
      .agg(
        vAt(k("0.01") + 1).cast(money).as("loA"),
        vAt(k("0.01") + 2).cast(money).as("loB"),
        vAt(k("0.99") + 1).cast(money).as("hiA"),
        vAt(k("0.99") + 2).cast(money).as("hiB"),
        max(frac("0.01")).as("dLo"),
        max(frac("0.99")).as("dHi"))
      .select((keys.map(col) :+ interp("loA", "loB", "dLo").as("lo") :+
        interp("hiA", "hiB", "dHi").as("hi")): _*)
  }

  /** The matching oracle bound computation: explicit order statistics +
    * the same exact-decimal interpolation (`quantile_cont` itself would
    * agree only up to float ulp). Yields a 1-row CTE `b(lo, hi)`.
    */
  private def sqlWinsorBounds(table: String, c: String): String = s"""
      nn AS (SELECT count(*) AS n FROM $table),
      srt AS (SELECT $c AS v,
                     row_number() OVER (ORDER BY $c) - 1 AS i FROM $table),
      pq AS (SELECT
          CAST(floor((n - 1) * CAST(0.01 AS DECIMAL(4,2))) AS BIGINT) AS klo,
          CAST((n - 1) * CAST(0.01 AS DECIMAL(4,2))
               - floor((n - 1) * CAST(0.01 AS DECIMAL(4,2))) AS DECIMAL(4,2)) AS dlo,
          CAST(floor((n - 1) * CAST(0.99 AS DECIMAL(4,2))) AS BIGINT) AS khi,
          CAST((n - 1) * CAST(0.99 AS DECIMAL(4,2))
               - floor((n - 1) * CAST(0.99 AS DECIMAL(4,2))) AS DECIMAL(4,2)) AS dhi
        FROM nn),
      os AS (SELECT
          max(dlo) AS dlo, max(dhi) AS dhi,
          max(CASE WHEN i = klo THEN CAST(v AS DECIMAL(18,2)) END) AS loa,
          max(CASE WHEN i = klo + 1 THEN CAST(v AS DECIMAL(18,2)) END) AS lob,
          max(CASE WHEN i = khi THEN CAST(v AS DECIMAL(18,2)) END) AS hia,
          max(CASE WHEN i = khi + 1 THEN CAST(v AS DECIMAL(18,2)) END) AS hib
        FROM srt, pq),
      b AS (SELECT
          CAST(loa + dlo * (coalesce(lob, loa) - loa) AS DOUBLE) AS lo,
          CAST(hia + dhi * (coalesce(hib, hia) - hia) AS DOUBLE) AS hi
        FROM os)"""

  /** Winsorization — percentile clipping, the standard outlier treatment
    * before training-data statistics: values below p01 / above p99 clamp
    * to the bound. TWO scans total, matching the oracle's count: scan 1
    * is [[winsorCells]]' sketch pass, scan 2 builds the bucketed cells
    * KEYED BY the output group — the same cells then serve both the exact
    * bound derivation ([[boundsFromCells]], tiny) and the final clipped
    * aggregate, which is computed from the CELLS, not a third raw pass:
    * a cell is entirely below lo (bucket 0, or an in-bracket value < lo
    * — bounds never leave their bracket, so cell-level classification is
    * exact), entirely above hi, or entirely unclipped, and its
    * contribution is cnt·cast(bound) or the cell's exact-decimal value
    * sum — identical arithmetic to the per-row clip-then-cast, so the
    * hash is unchanged. The cells are localCheckpointed (they are
    * sketch-bounded-tiny) so the two consumers never rescan the fact
    * table. For row-level clip application, broadcast
    * [[winsorBounds]] and `least/greatest` map-side.
    */
  val q121Winsorize = Q(
    "q121_winsorize",
    (s, d) => {
      val li = graft.core.Tables.lineitem(s, d)
      val cells = winsorCells(li, "l_extendedprice", Seq("l_returnflag"))
        .localCheckpoint()
      val bounds = boundsFromCells(cells)
      val money = graft.core.Num.Money
      val belowLo = col("bucket") === 0 ||
        (col("bv").isNotNull && col("bv") < col("lo"))
      val aboveHi = col("bucket") === 4 ||
        (col("bv").isNotNull && col("bv") > col("hi"))
      val contrib = when(belowLo, col("cnt") * col("lo").cast(money))
        .when(aboveHi, col("cnt") * col("hi").cast(money))
        .otherwise(col("vsum"))
      cells.crossJoin(broadcast(bounds))
        .groupBy("l_returnflag")
        .agg(
          sum(col("cnt")).as("n"),
          sum(when(belowLo || aboveHi, col("cnt")).otherwise(lit(0L)))
            .as("n_clipped"),
          sum(contrib).cast("double").as("clipped_sum"))
    },
    Some(s"""
      WITH ${sqlWinsorBounds("lineitem", "l_extendedprice")}
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             ${graft.core.Num.sqlDsum("least(greatest(l_extendedprice, lo), hi)")} AS clipped_sum
      FROM lineitem CROSS JOIN b
      GROUP BY l_returnflag
    """),
  )

  /** Per-group winsorization bounds — the 100 TB form: per-key p01/p99 via
    * one grouped, mergeable `approx_percentile` pass (a sketch per group,
    * merged map-side — no per-group sort, no single-point buffer), with
    * the q44/q90-style accuracy contract: the exact per-group bound
    * anchors the row and a flag asserts the sketch landed within
    * tolerance — estimator quality is part of the correctness gate. The
    * sketch guarantee is RANK-space (±n/accuracy ranks), so the value
    * tolerance must absorb one order-statistic gap at the probed rank:
    * at the sparse p01 tail of a ~2k-row group adjacent ranks sit up to
    * ~6% apart (measured), hence 10% for the low bound; the dense p99
    * shoulder stays within 0.5%. Both tighten with n (≤0.1% at sf0.1).
    * The exact anchor comes from [[groupWinsorCells]]/
    * [[groupBoundsFromCells]] — the bracket technique applied PER GROUP
    * (grouped sketch probes, per-group brackets, group-partitioned
    * windows), so NO `percentile` and no per-group value buffer exists
    * anywhere in the plan; the contract's direct sketch estimates ride
    * in the same probe array, so the sketch is built once.
    */
  val q122GroupWinsorBounds = Q(
    "q122_group_winsor_bounds",
    (s, d) => {
      val keys = Seq("l_returnflag")
      val cells = groupWinsorCells(
        graft.core.Tables.lineitem(s, d), "l_extendedprice", keys)
        .localCheckpoint()
      val bounds = groupBoundsFromCells(cells, keys)
      val contract = cells.groupBy("l_returnflag")
        .agg(max(col("n")).as("n"), max(col("alo")).as("alo"),
          max(col("ahi")).as("ahi"))
      bounds.join(contract, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          round(col("lo"), 6).as("exact_lo"),
          round(col("hi"), 6).as("exact_hi"),
          col("alo"), col("ahi"))
        .select(col("l_returnflag"), col("n"), col("exact_lo"), col("exact_hi"),
          (abs(col("alo") - col("exact_lo")) / col("exact_lo") <= 0.10)
            .as("lo_within_10pct"),
          (abs(col("ahi") - col("exact_hi")) / col("exact_hi") <= 0.005)
            .as("hi_within_half_pct"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             round(quantile_cont(l_extendedprice, 0.01), 6) AS exact_lo,
             round(quantile_cont(l_extendedprice, 0.99), 6) AS exact_hi,
             TRUE AS lo_within_10pct,
             TRUE AS hi_within_half_pct
      FROM lineitem GROUP BY l_returnflag
    """),
  )

  /** Per-source token-distribution divergence — KL(source ‖ corpus), the
    * domain-shift / mixture-drift signal a training-data pipeline computes
    * when rebalancing source mixes (complements q93's token SHARES with a
    * distributional distance). KL needs no smoothing here because every
    * source term is by construction in the corpus support. Plan shape: one
    * map-side tokenize, one shuffle on (source, word); the corpus
    * distribution is a REAGGREGATION of the per-source counts (never a
    * second scan), totals are broadcast 1-row/5-row frames, and each KL
    * term is p·ln(p/q) computed from exact integer ratios so both engines
    * feed libm the identical double (only the final sum is rounded).
    */
  /** KL(source ‖ corpus) over a (source, text) frame — see [[q127TokenDivergence]]. */
  private[graft] def tokenDivergence(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("source"),
        explode(split(Pipeline.normText(col("text")), " ")).as("w"))
    val srcCnt = tok.groupBy("source", "w")
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val corpCnt = srcCnt.groupBy("w").agg(sum(col("c")).as("cw"))
    val srcTot = srcCnt.groupBy("source").agg(sum(col("c")).as("t"))
    val corpTot = srcCnt.agg(sum(col("c")).as("tt"))
    srcCnt
      .join(corpCnt, "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_terms"),
        max(col("t")).as("n_tokens"),
        round(sum((col("c") / col("t")) *
          log((col("c") * col("tt")) / (col("t") * col("cw")))), 6).as("kl"))
  }

  val q127TokenDivergence = Q(
    "q127_token_divergence",
    (s, d) => tokenDivergence(Tables.documents(s, d)),
    Some(s"""
      WITH norm AS (SELECT source, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT source, unnest(string_split(norm, ' ')) AS w FROM norm),
      sc AS (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2),
      cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM sc GROUP BY 1),
      st AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM sc GROUP BY 1),
      ct AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM sc)
      SELECT sc.source, count(*) AS n_terms, max(st.t) AS n_tokens,
             round(sum((sc.c * 1.0 / st.t) *
               ln((sc.c * ct.tt) * 1.0 / (st.t * cw.cw))), 6) AS kl
      FROM sc
      JOIN cw ON cw.w = sc.w
      JOIN st ON st.source = sc.source
      CROSS JOIN ct
      GROUP BY 1
    """),
  )

  /** Bigram-LM cross-entropy / perplexity scoring — the KenLM-style quality
    * signal a training pipeline computes to rank documents by how "corpus-
    * like" they are (CCNet filters on exactly this). The LM is add-one-
    * smoothed P(w2|w1) = (c12+1)/(c1+V), trained on the corpus itself.
    *
    * Scale shape (reshaped round 9 per VERDICT r8 #1): the raw occurrence
    * stream NEVER crosses the wire. The first reduction is
    * groupBy(doc_id, w1, w2) — its map-side partial agg collapses
    * within-doc repeats before the exchange, and its key is UNIFORM
    * (doc_id spreads the Zipf head: every task holds a slice of "of the",
    * none holds all of it), so no straggler can form there. Only the
    * already-counted per-doc gram frame is then repartitioned ONCE on the
    * gram key (w1, w2); the corpus c12 totals and the scoring join are
    * both NARROW on top of that layout, and AQE reuses the one gram-keyed
    * stage across the branches (PlanSpec asserts exactly one bigram
    * explode survives in the final plan). Scoring weights each distinct
    * per-doc gram by its count: Σ n·ln(p) ≡ Σ_raw ln(p). The previous
    * shape deliberately shuffled raw occurrences to save the pre-agg pass
    * (6.7 s vs 9.7 s at sf1 on the builder's host) — but on a
    * GC-pressured shared JVM the Zipf-headed raw exchange drew 17-34 s
    * stragglers (driver's BENCH_r08), and at 100 TB it is a
    * full-corpus-token shuffle; the pre-agg caps wire volume at
    * doc-distinct grams on uniform keys, which is the shape that
    * survives scale. Every explicit width scales with input size via
    * [[graft.core.ScaleWidth]] instead of taking
    * spark.sql.shuffle.partitions wholesale (the conf-width 32-way tiny
    * exchanges were the other half of the r8 driver stragglers: measured
    * 1.7 s → 1.2 s min at sf0.1 from this alone). Explicit partition
    * counts pin both sides of the scoring join to the same layout so AQE
    * cannot coalesce them apart. (A localCheckpoint would NOT work here: Spark
    * 4.1's Dataset.localCheckpoint reports UnknownPartitioning on the
    * LogicalRDD, which silently reinstates the big-frame reshuffle.)
    * V and the model totals follow the q127 float-parity pattern: every
    * ln() argument is a ratio of exact integer-valued doubles, so both
    * engines feed libm identical inputs; the oracle SQL mirrors the
    * grouped weighted-summation form.
    */
  private[graft] def lmPerplexity(docs: DataFrame): DataFrame = {
    // all explicit exchange widths scaled to the input (VERDICT r8 #1b):
    // ~256 KB of compressed corpus per partition (~1 MB of raw text —
    // regex-normalize + explode + hash-agg over that is a well-sized
    // task). sf0.1: 3; sf1: ~24; 100 TB: the 2^20 cap, not the session's
    // 32 — the width tracks the data on both ends.
    val p2 = graft.core.ScaleWidth.forInput(docs, 256L << 10)
    // decouple compute parallelism from file layout: a compact corpus file
    // scans as a handful of row groups, serializing the regex-normalize +
    // explode (measured 6.3 s → 1.8 s at sf1 on a 2-row-group file). Only
    // when the scan is coarser than the target parallelism — at real scale
    // splits are plentiful and the raw-text shuffle would be pure waste.
    // normalize BELOW the repartition: the regex-normalize is the
    // expensive map work and toks has two consumers (bigrams + vocab) —
    // with the exchange carrying raw text each consumer re-normalized;
    // carrying norm, both reuse the exchange and re-run only split.
    // When the scan is already parallel enough (real scale) there is no
    // exchange and the duplicated normalize stays the right trade vs a
    // raw-text shuffle.
    val normed = Pipeline.normDocs(docs)
    val normP =
      if (docs.rdd.getNumPartitions < p2) normed.repartition(p2) else normed
    val toks = normP
      .select(col("doc_id"), split(col("norm"), " ").as("ws"))
    // map-side pre-reduction INSIDE the expression: BigramFreq walks the
    // normalized bytes once and emits already-collapsed per-doc distinct
    // (w1, w2, n) rows — the interpreted zip_with-over-two-slice-copies
    // chain and the (doc_id, w1, w2) hash-agg exchange it fed are both
    // gone (that exchange existed only to collapse within-doc repeats,
    // which the walk now does for free). A raw occurrence row never
    // exists, so no Zipf-keyed occurrence stream can cross a wire at any
    // scale.
    val bgcBase = normP
      .select(col("doc_id"),
        explode(graft.functions.BigramFreq(col("norm"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"),
        col("b.n").as("n"))
    val vocab = toks
      .select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // VERDICT r10 #1: the bigram MODEL is corpus-derived but gram-distinct —
    // orders of magnitude smaller than the corpus (Heaps' law) and bounded
    // enough to broadcast for any dimension-sized corpus. While the raw docs
    // scan sits under the broadcast cap, scoring goes MAP-SIDE: the walked
    // gram stream joins a broadcast model (no scoring-join exchange at
    // all; the model derivation re-runs the walk above the shared normP
    // exchange — two walks beat one walk plus a doc-keyed hash-agg
    // exchange, measured on the q132 A/B). Past the cap the vocabulary is
    // web-scale-unbounded and the co-partitioned equi-join below is the
    // shape that survives: the scoring side crosses ONE gram-keyed
    // exchange of doc-distinct count rows, and the model branch re-walks
    // the shared normP exchange into its own partial-agg-combined
    // groupBy (corpus-distinct grams on the wire — tiny). Re-walking is
    // deliberate: the branches read different columns, so column pruning
    // canonically splits any exchange they might share, and pinning a
    // shared layout would take a persisted corpus-sized gram cache —
    // storage state the stateless double walk beats at 100 TB. The gate
    // measures the RAW scan, whose estimate is honest without CBO.
    val scored =
      if (graft.core.Hints.isDimSized(docs)) {
        val c12 = bgcBase.groupBy("w1", "w2").agg(sum(col("n")).as("c12"))
        val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
        bgcBase.join(broadcast(c12.join(c1, Seq("w1"))), Seq("w1", "w2"))
      } else {
        val bgc = bgcBase.repartition(p2, col("w1"), col("w2"))
        val c12 = bgcBase.groupBy("w1", "w2").agg(sum(col("n")).as("c12"))
        val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
        // gram-keyed model rows; vocab-sized c1 stays an equi-join (a
        // broadcast would assume a bounded vocabulary — false at web scale)
        val model = c12.join(c1, Seq("w1")).repartition(p2, col("w1"), col("w2"))
        bgc.join(model, Seq("w1", "w2")) // co-partitioned: no bgc-side exchange
      }
    scored
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        sum(col("n")).as("n_bigrams"),
        (-sum(col("n") * log((col("c12") + 1) / (col("c1") + col("v")))) /
          sum(col("n"))).as("h"))
      .select(
        col("doc_id"), col("n_bigrams"),
        round(col("h"), 6).as("cross_entropy"),
        round(exp(col("h")), 6).as("ppl"))
  }

  val q132LmPerplexity = Q(
    "q132_lm_perplexity",
    (s, d) => lmPerplexity(Tables.documents(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      words AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
      bg AS (
        SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        FROM words CROSS JOIN (SELECT CAST(unnest(range(1,
          1 + (SELECT max(len(ws)) FROM words))) AS INT) AS i) r
        WHERE len(ws) >= 2 AND i <= len(ws) - 1),
      bgc AS (SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY 1, 2, 3),
      c12 AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c12
              FROM bgc GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(ws) AS w FROM words)),
      h AS (
        SELECT bgc.doc_id, CAST(sum(bgc.n) AS BIGINT) AS n_bigrams,
               -sum(bgc.n * ln((c12.c12 + 1) * 1.0 / (c1.c1 + v.v))) /
                 sum(bgc.n) AS h
        FROM bgc
        JOIN c12 ON c12.w1 = bgc.w1 AND c12.w2 = bgc.w2
        JOIN c1 ON c1.w1 = bgc.w1
        CROSS JOIN v
        GROUP BY 1)
      SELECT doc_id, n_bigrams, round(h, 6) AS cross_entropy,
             round(exp(h), 6) AS ppl
      FROM h
    """),
  )

  /** Gopher-style hard quality gate — the rule-based document filter every
    * public curation pipeline applies before model-based scoring (Gopher
    * §A1.1, RefinedWeb, Dolma): word-count bounds, mean-word-length
    * bounds, alphabetic-word fraction, minimum stopword hits. Each rule's
    * VIOLATION sets a bit, so downstream can both filter (`pass`) and
    * audit which rule fired (`rule_mask`) without re-running the gate.
    * Pure map-side — no shuffle at all: every signal is a per-doc
    * expression over the normalized text. Rule comparisons run on exact
    * integer-ratio doubles, so both engines take identical branches.
    */
  private val gateStops = graft.functions.GateStats.Stops

  private[graft] def qualityGate(norm: DataFrame): DataFrame = {
    // one native single-pass token walk (GateStats) instead of three
    // interpreted higher-order lambdas over a re-split token array — the
    // signals and every downstream ratio/rule are byte-identical
    val stats = norm.select(
      col("doc_id"),
      length(col("norm")).as("len"),
      graft.functions.GateStats(col("norm")).as("st"))
    val nw = col("st.nw")
    val meanWl = (col("len") - nw + 1) / nw.cast("double")
    val alphaFrac = col("st.n_alpha") / nw.cast("double")
    val nStop = col("st.n_stop")
    val viol = Seq(
      nw < 30 || nw > 10000,
      meanWl < 3.0 || meanWl > 10.0,
      alphaFrac < 0.8,
      nStop < 2,
    )
    val mask = viol.zipWithIndex
      .map { case (v, i) => when(v, 1 << i).otherwise(0) }
      .reduce(_ + _)
    stats.select(
      col("doc_id"),
      nw.as("n_words"),
      round(meanWl, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stop"),
      mask.cast("int").as("rule_mask"),
      (mask === 0).as("pass"))
  }

  /** Gate feature SELECT over a (doc_id, norm) CTE — shared between the
    * q136 oracle and any composition (q144) so the two can never drift.
    */
  private[operators] def sqlGateFeatures(src: String): String = {
    val stops = gateStops.map(w => s"'$w'").mkString(", ")
    s"""
        SELECT doc_id,
               CAST(len(string_split(norm, ' ')) AS BIGINT) AS nw,
               (length(norm) - len(string_split(norm, ' ')) + 1)
                 / CAST(len(string_split(norm, ' ')) AS DOUBLE) AS mean_wl,
               len(list_filter(string_split(norm, ' '),
                 w -> regexp_matches(w, '[a-z]')))
                 / CAST(len(string_split(norm, ' ')) AS DOUBLE) AS alpha_frac,
               CAST(len(list_filter(string_split(norm, ' '),
                 w -> w IN ($stops))) AS BIGINT) AS n_stop
        FROM $src"""
  }

  /** The rule-violation bitmask over [[sqlGateFeatures]]' columns. */
  private[operators] val sqlGateMask: String =
    """(CASE WHEN nw < 30 OR nw > 10000 THEN 1 ELSE 0 END
              + CASE WHEN mean_wl < 3.0 OR mean_wl > 10.0 THEN 2 ELSE 0 END
              + CASE WHEN alpha_frac < 0.8 THEN 4 ELSE 0 END
              + CASE WHEN n_stop < 2 THEN 8 ELSE 0 END)"""

  val q136QualityGate = Q(
    "q136_quality_gate",
    (s, d) => qualityGate(docsNorm(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      t AS (${sqlGateFeatures("norm")}),
      m AS (
        SELECT doc_id, nw, mean_wl, alpha_frac, n_stop,
               $sqlGateMask AS mask
        FROM t)
      SELECT doc_id, nw AS n_words, round(mean_wl, 6) AS mean_word_len,
             round(alpha_frac, 6) AS alpha_frac, n_stop,
             CAST(mask AS INT) AS rule_mask, mask = 0 AS pass
      FROM m
    """),
  )

  /** Corpus-level PMI collocations — the phrase-mining / tokenizer-vocab
    * induction step (WordPiece/unigram-LM candidate scoring ranks merges
    * by exactly this statistic): pmi(w1,w2) = ln(c12·N / (c1·c2)) over
    * bigram counts, min-support 5, global top 50. Scale shape: ONE shuffle
    * of raw bigrams into the (w1, w2) groupBy — map-side partial agg
    * collapses the stream to the gram-distinct model before it crosses the
    * wire — then everything downstream (c1/c2 reaggregations, the two
    * equi-joins, the broadcast N) operates on gram-distinct frames, and
    * the global top-k is a TakeOrdered over ≤|V|² scored rows, never a
    * full sort. ln() inputs are exact integer ratios (q127/q132 parity).
    * Scan width scales with input size ([[graft.core.ScaleWidth]], same
    * rationale as q132): the session's conf width oversizes tiny corpora
    * into per-task overhead and undersizes 100 TB ones.
    */
  private[graft] def pmiCollocations(docs: DataFrame, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val p = graft.core.ScaleWidth.forInput(docs, 256L << 10)
    val docsP =
      if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
    // native single-pass bigram walk (the q132 BigramFreq swap applied
    // here too): the zip_with-over-two-slice-copies chain ran as an
    // interpreted lambda per token; BigramFreq emits per-doc collapsed
    // (w1, w2, n) rows map-side, and Σn over docs equals the occurrence
    // count(*) the composed explode produced
    val c12 = Pipeline
      .normDocs(docsP)
      .select(explode(graft.functions.BigramFreq(col("norm"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(sum(col("bg.n")).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("n"))
    c12.filter(col("c12") >= minCount)
      .join(c1, Seq("w1"))
      .join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12") * col("n") / (col("c1") * col("c2"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  val q137PmiCollocations = Q(
    "q137_pmi_collocations",
    (s, d) => pmiCollocations(Tables.documents(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      words AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
      bg AS (
        SELECT ws[i] AS w1, ws[i+1] AS w2
        FROM words CROSS JOIN (SELECT CAST(unnest(range(1,
          1 + (SELECT max(len(ws)) FROM words))) AS INT) AS i) r
        WHERE len(ws) >= 2 AND i <= len(ws) - 1),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
      c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
      n AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM c12)
      SELECT c12.w1, c12.w2, c12.c12,
             round(ln(c12.c12 * n.n * 1.0 / (c1.c1 * c2.c2)), 6) AS pmi
      FROM c12
      JOIN c1 ON c1.w1 = c12.w1
      JOIN c2 ON c2.w2 = c12.w2
      CROSS JOIN n
      WHERE c12.c12 >= 5
      ORDER BY pmi DESC, c12.w1, c12.w2
      LIMIT 50
    """),
  )

  /** Unicode canonicalization fingerprints — every hash-keyed curation
    * operator (dedup, decontamination, CDC) silently forks if decomposed
    * and precomposed encodings of the same text reach it unmerged, so a
    * real pipeline NFC-normalizes before any fingerprinting. The corpus
    * is ASCII (already NFC), so the query plants a decomposed suffix
    * (" nai" U+0308 "ve cafe" U+0301) on every document and proves the
    * native [[graft.functions.NfcNormalize]] expression composes it:
    * n_nfc = n_raw − 2 and the md5 is taken over the COMPOSED bytes,
    * which DuckDB's `nfc_normalize` must reproduce byte-identically.
    * Scale shape: pure map-side (one codegen'd JDK Normalizer call per
    * row, with an allocation-free isNormalized fast path for the ASCII
    * bulk), no shuffle at all.
    */
  private[graft] def nfcFingerprint(docs: DataFrame): DataFrame = {
    // decomposed on purpose (explicit escapes so no editor can silently
    // re-compose them): 'i'+U+0308 and 'e'+U+0301
    val mixed = concat(col("text"), lit(" nai\u0308ve cafe\u0301"))
    val nfc = graft.functions.NfcNormalize(mixed)
    docs.select(
      col("doc_id"),
      length(mixed).as("n_raw"),
      length(nfc).as("n_nfc"),
      md5(nfc).as("h"))
  }

  val q148NfcNormalize = Q(
    "q148_nfc_normalize",
    (s, d) => nfcFingerprint(Tables.documents(s, d)),
    Some("""
      SELECT doc_id,
             CAST(length(text || ' nai' || chr(776) || 've cafe' || chr(769))
               AS INT) AS n_raw,
             CAST(length(nfc_normalize(
               text || ' nai' || chr(776) || 've cafe' || chr(769)))
               AS INT) AS n_nfc,
             md5(nfc_normalize(
               text || ' nai' || chr(776) || 've cafe' || chr(769))) AS h
      FROM documents
    """),
  )

  /** BM25 keyword retrieval — the lexical half of a retrieval stack (the
    * dense half is q40/q142): Okapi BM25 with k1=1.2, b=0.75 over the
    * canonical tokenization, scoring a fixed conjunctive keyword query
    * and returning the top-k documents. Generalizes q104's raw tf·idf
    * with the two saturations that made BM25 the lexical default:
    * diminishing returns in tf and document-length normalization against
    * avgdl. Scale shape: tf AND dl come out of ONE map-side
    * TokenFreqMap pass (no tokenize replay, no doc-key join); the term
    * filter drops every non-query term BEFORE the only doc-keyed
    * aggregation; df and the corpus stats are k-row broadcast frames;
    * top-k is TakeOrderedAndProject on the ROUNDED score so the cut is
    * reproducible cross-engine.
    */
  val Bm25Terms = Seq("spark", "vector", "merge")

  /** Query terms arrive as DATA — a one-column (`term`) frame — not code
    * (VERDICT r10 #7): the engine can score any keyword set a caller
    * supplies (an alert list, a query log batch).
    *
    * Scale shape, stats-gated on the TERMS frame:
    *   - Dimension-sized terms (every realistic keyword query): the terms
    *     collect to a bounded list and ONE native [[graft.functions
    *     .TermTf]] walk emits (nw, tf[terms]) per document — no
    *     full-vocabulary TokenFreqMap build, no corpus-distinct explode.
    *     The (doc_id, nw, tf) frame is |terms|+2 numbers per doc (the
    *     posting-stats materialization a search engine keeps anyway),
    *     persisted serialized so corpus stats (n_docs, avgdl) AND the
    *     hit stream both read it without a second normalize pass —
    *     previously the stats branch re-ran the whole regex normalize
    *     (measured 0.7 s of q149's 2.2 s at sf1).
    *   - Past the cap (a decontamination-scale term list): the original
    *     TokenFreqMap + shuffle semi-join shape, which never needs the
    *     list in one piece.
    */
  private[graft] def bm25(norm: DataFrame, queryTerms: DataFrame,
      k: Int): DataFrame = {
    val spark = norm.sparkSession
    import spark.implicits._
    val hits =
      if (graft.core.Hints.isDimSized(queryTerms)) {
        val terms = queryTerms.select(col("term").cast("string"))
          .as[String].collect().distinct.sorted
        val termArr = array(terms.map(lit): _*)
        // eager localCheckpoint, not persist: a CacheManager entry outlives
        // its blocks under per-query cleanup (a later identical plan hits
        // the stale entry and recomputes per consumer), while a checkpoint
        // is a plain materialized RDD both consumers read
        val base = norm
          .select(col("doc_id"),
            graft.functions.TermTf(col("norm"), terms.toSeq).as("st"))
          .localCheckpoint(true)
        val stats = base.agg(
          count(lit(1)).as("n_docs"),
          avg(col("st.nw")).as("avgdl"))
        base
          .select(col("doc_id"), col("st.nw").cast("double").as("dl"),
            posexplode(col("st.tf")).as(Seq("ti", "tf")))
          .filter(col("tf") > 0)
          .select(col("doc_id"), col("dl"),
            element_at(termArr, col("ti") + 1).as("term"), col("tf"))
          .crossJoin(broadcast(stats))
      } else {
        val raw = norm.select(
            col("doc_id"),
            size(split(col("norm"), " ")).cast("double").as("dl"),
            explode(graft.functions.TokenFreqMap(split(col("norm"), " "))))
          .withColumnRenamed("key", "term")
          .withColumnRenamed("value", "tf")
          .join(queryTerms, Seq("term"), "left_semi")
        val stats = norm.agg(
          count(lit(1)).as("n_docs"),
          avg(size(split(col("norm"), " "))).as("avgdl"))
        raw.crossJoin(broadcast(stats))
      }
    val df = hits.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = hits
      .join(broadcast(df), "term")
      .withColumn("contrib",
        // operand order mirrors the oracle exactly: IEEE mult commutes,
        // and 0.75*dl/avgdl must stay (0.75*dl)/avgdl, not dl*(0.75/avgdl)
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") +
            (lit(0.25) + (col("dl") * 0.75) / col("avgdl")) * 1.2))
    val topk = scored.groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
    topk.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
  }

  /** Shared oracle template for the BM25 gates, parameterized on the term
    * list — q149 and q175 use the SAME SQL with different term data, so a
    * term-plumbing bug (the parameterization this round added) cannot
    * pass one gate and hide in the other.
    */
  private def sqlBm25(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (
        SELECT doc_id, CAST(len(string_split(norm, ' ')) AS DOUBLE) AS dl,
               unnest(string_split(norm, ' ')) AS term
        FROM norm),
      hits AS (
        SELECT doc_id, max(dl) AS dl, term, count(*) AS tf
        FROM w WHERE term IN ($inList)
        GROUP BY doc_id, term),
      stats AS (
        SELECT count(*) AS n_docs,
               avg(len(string_split(norm, ' '))) AS avgdl
        FROM norm),
      df AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
      scored AS (
        SELECT doc_id,
               ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
                 (tf * 2.2) /
                 (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS contrib
        FROM hits JOIN df USING (term) CROSS JOIN stats),
      agg AS (
        SELECT doc_id, round(sum(contrib), 6) AS bm25,
               CAST(count(*) AS BIGINT) AS n_terms_hit
        FROM scored GROUP BY doc_id)
      SELECT doc_id, bm25, n_terms_hit,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS rank
      FROM agg ORDER BY bm25 DESC, doc_id LIMIT $k
    """
  }

  private def termsFrame(s: SparkSession, terms: Seq[String]): DataFrame = {
    import s.implicits._
    terms.toDF("term")
  }

  val q149Bm25 = Q(
    "q149_bm25",
    (s, d) => bm25(docsNorm(s, d), termsFrame(s, Bm25Terms), 20),
    Some(sqlBm25(Bm25Terms, 20)),
  )

  /** The parameterization witness (VERDICT r10 #7): same operator, a
    * DIFFERENT term set supplied as data, same shared oracle template.
    */
  val Bm25AltTerms = Seq("query", "stream", "data")

  val q175Bm25Params = Q(
    "q175_bm25_params",
    (s, d) => bm25(docsNorm(s, d), termsFrame(s, Bm25AltTerms), 20),
    Some(sqlBm25(Bm25AltTerms, 20)),
  )

  /** Positional phrase search — the exact-adjacency query BM25 (q149)
    * cannot answer: find documents containing the words of a phrase at
    * CONSECUTIVE positions, counting occurrences. The classic positional
    * inverted index, distributed: one posexplode pass emits (doc, term,
    * pos) postings, the query-term filter prunes the stream to
    * posting-list size BEFORE any shuffle, and adjacency is a fold of
    * (doc_id, pos−i) equi-joins — term i must sit exactly i positions
    * after the anchor, so an n-term phrase is n−1 hash joins of bounded
    * posting frames, never a string scan or regex over the corpus.
    * Top-k by (count desc, doc_id) is a TakeOrdered over a unique
    * composite — the cut is reproducible cross-engine.
    */
  val PhraseTerms = Seq("table", "hash")

  private[graft] def phraseSearch(
      norm: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val idx = norm
      .select(col("doc_id"),
        posexplode(split(col("norm"), " ")).as(Seq("pos", "term")))
      .filter(col("term").isin(terms: _*))
    val anchor = idx.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matches = terms.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(idx.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matches.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(k)
  }

  val q161PhraseSearch = Q(
    "q161_phrase_search",
    (s, d) => phraseSearch(docsNorm(s, d), PhraseTerms, 10),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      words AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
      w AS (
        SELECT doc_id, ws[i] AS term, i AS pos
        FROM words CROSS JOIN (SELECT CAST(unnest(range(1,
          1 + (SELECT max(len(ws)) FROM words))) AS INT) AS i) r
        WHERE i <= len(ws) AND ws[i] IN ('table', 'hash')),
      a AS (SELECT doc_id, pos FROM w WHERE term = 'table'),
      b AS (SELECT doc_id, pos - 1 AS pos FROM w WHERE term = 'hash'),
      m AS (SELECT a.doc_id FROM a JOIN b USING (doc_id, pos))
      SELECT doc_id, count(*) AS n_occurrences
      FROM m GROUP BY doc_id
      ORDER BY n_occurrences DESC, doc_id LIMIT 10
    """),
  )

  val all: Seq[Q] =
    Seq(q101RepMetrics, q102PiiScrub, q104TfidfTerms, q111HeavyHitters,
      q121Winsorize, q122GroupWinsorBounds, q127TokenDivergence,
      q132LmPerplexity, q136QualityGate, q137PmiCollocations,
      q148NfcNormalize, q149Bm25, q161PhraseSearch, q175Bm25Params)
}
