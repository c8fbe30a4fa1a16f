package graft.operators

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over the `documents` table: exact and
  * near-duplicate detection, text analysis, and chunking — the operations a
  * 100 TB LLM-data pipeline needs (builder brief; VERDICT r1 "LLM-pipeline
  * operators, bucketed from day one").
  *
  * Cross-engine determinism: every hash here is md5 (identical lowercase hex
  * in Spark and DuckDB), so signatures, buckets, and fingerprints
  * hash-compare exactly against the DuckDB oracle. Near-dup detection is
  * LSH-banded from the start — candidates come from equi-joins on band keys
  * (shuffle on the band key, horizontally scalable), NEVER an all-pairs
  * cross join, so the same plan survives the 100 TB design point.
  *
  * Reference anchors: the reference's only text machinery is the RAG chunker
  * (`api/ingest_docs.py:44-62`) and doc ingestion (`api/ingest_docs.py:85-131`);
  * dedup/similarity/text-analysis are the scale extensions the brief makes
  * first-class.
  */
object Pipeline {

  /** Whitespace-collapsed, lowercased, trimmed text — the canonical form all
    * dedup/fingerprint operators key on (mirrors the reference chunker's
    * whitespace normalization, `api/ingest_docs.py:47`). Public and SHARED
    * (TrainPrep, DocStreams): batch/stream/oracle hash parity depends on
    * every consumer using byte-identical normalization.
    */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** DuckDB-side mirror of [[normText]] — same sharing contract. */
  val sqlNorm: String => String =
    c => s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"

  /** Normalize any (doc_id, text) frame to (doc_id, norm). */
  def normDocs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), normText(col("text")).as("norm"))

  private[graft] def docsNorm(s: SparkSession, d: String): DataFrame =
    normDocs(Tables.documents(s, d))

  /** Word 3-gram shingles, distinct per doc. The inverted-index formulation:
    * one row per (doc, shingle), so all downstream similarity work is
    * equi-joins on the shingle/band key — no cross joins. Docs with <3 words
    * yield no shingles (matching the oracle).
    */
  def shinglesOf(norm: DataFrame): DataFrame = ngramsOf(norm, 3)

  /** Word n-gram shingles, distinct per doc — [[shinglesOf]] generalized
    * (n=3 for similarity, n=8 for decontamination). Docs with <n words
    * yield no shingles (matching the oracles).
    */
  def ngramsOf(norm: DataFrame, n: Int): DataFrame =
    ngramsRawOf(norm, n).distinct()

  /** Pre-distinct n-gram stream (one row per gram OCCURRENCE). */
  private[operators] def ngramsRawOf(norm: DataFrame, n: Int): DataFrame = {
    val w = norm
      .select(col("doc_id"), split(col("norm"), " ").as("ws"))
      .filter(size(col("ws")) >= n)
    w.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(1), size(col("ws")) - (n - 1)),
          i =>
            concat_ws(" ",
              (0 until n).map(k => element_at(col("ws"), i + k)): _*))).as("s"))
  }

  /** 60-bit shingle key: the first 15 hex digits of md5, identically
    * computable in DuckDB (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`).
    * Every downstream index shuffle/join (distinct, df-cap, Jaccard
    * intersection) then moves 8-byte longs instead of ~25-char strings —
    * measurably less shuffle volume and cheaper sort keys, and the same
    * win multiplies at 100 TB. Collisions: ~N²/2^61 for N distinct grams
    * (≪1 even at billions of grams), and IDENTICAL in both engines, so
    * the oracle comparison is exact by construction, not probabilistically.
    */
  def hashGram(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB-side mirror of [[hashGram]]. */
  val sqlHashGram: String => String =
    c => s"CAST('0x' || substr(md5($c), 1, 15) AS BIGINT)"

  /** Fan the normalized docs out BEFORE the digest map stages (GramKeys /
    * MinHash4 — an md5 per gram, the dedup family's serial CPU) when the
    * scan arrives narrower than the input size warrants (round 15,
    * guide §2.6). The bench corpus is a single row-group file at every
    * SF, so the digest ran as ONE task even at sf1 (~4 s of the q33/q31
    * walls; the sf1 8-vs-32-core ratios sat at ~1.0 — serial). Gate:
    * width from input size (~128 KB compressed text per partition — the
    * digest is doc-count-bound, so partitions stay small in bytes),
    * capped by task slots, and only when the scan actually delivers
    * fewer partitions — so sf0.1 and below stay exchange-free (r14
    * measured fan-out losing there, twice; the estimate-derived width is
    * ≤ 2 there), and at 100 TB scans arrive thousands of splits wide and
    * the gate is a no-op again. It fires exactly in the middle band:
    * sf1 measured q33 min 5.18 → 3.8–4.9 s (width sweep 7/16/32 gave
    * 5.8/4.9/3.8) with byte-identical output.
    */
  private[operators] def digestWide(norm: DataFrame): DataFrame = {
    val slots = norm.sparkSession.sparkContext.defaultParallelism
    val target = math.min(math.min(
      graft.core.ScaleWidth.forInput(norm, 128L << 10), 32), slots)
    // floor 8 ≈ input ≥ ~1 MB compressed: q116's sf0.1 UNION input
    // (2 × 254 KB estimate → width 4) slipped past a floor of 4 and paid
    // the exchange r14 measured as a loss at that scale (+0.3 s); every
    // sf1 site derives width ≥ 20, so the floor only de-arms the gate in
    // the sub-MB band where it loses
    if (target < 8 || norm.rdd.getNumPartitions >= target) norm
    else norm.repartition(target, col("doc_id"))
  }

  /** Hashed distinct shingle index (doc_id, s: long) via the native
    * [[graft.functions.GramKeys]] expression: per-doc key sets come out of
    * ONE map-side pass (dedup inside the expression), so the index build
    * has no string materialization and NO distinct shuffle at all — the
    * exploded stream IS the inverted index. Key identity with
    * [[hashGram]]/[[sqlHashGram]] is asserted in PipelineSpec. The input
    * widens through [[digestWide]] first (a no-op outside the narrow-scan
    * band).
    */
  def hashedShinglesOf(norm: DataFrame, n: Int = 3): DataFrame =
    digestWide(norm).select(
      col("doc_id"),
      explode(graft.functions.GramKeys(split(col("norm"), " "), n)).as("s"))

  private def shingles(s: SparkSession, d: String): DataFrame =
    shinglesOf(docsNorm(s, d))

  /** Document-frequency cap for the shingle inverted index. A shingle
    * appearing in more than `DfCap` documents ("click here to subscribe")
    * contributes O(df²) candidate rows to any shingle-keyed self-join —
    * quadratic on exactly the shingles that carry no similarity signal.
    * Every Jaccard consumer (q31 refinement, q33 exact, q34 clustering)
    * works over the capped index; the oracles mirror the cap, so both
    * engines compute the same capped-Jaccard.
    */
  val DfCap = 1000

  /** Drop shingles with document frequency above `dfCap`. df comes from a
    * groupBy (map-side partial aggregation: a hot stop-word shingle
    * reduces to one row per input partition before the shuffle) joined
    * back onto the index on the SAME key the downstream joins shuffle on.
    * NOT a window count — `count(*) OVER (PARTITION BY s)` buffers every
    * row of a shingle in one task's window buffer, so the hottest shingle
    * (df bounded only by corpus size) concentrates in a single task: a
    * skew/spill cliff at the 100 TB design point, even though it measured
    * 25–40% faster at sf0.1. The branches (df agg + join probe + every
    * downstream consumer) share the repartition exchange via
    * ReuseExchange — an eager localCheckpoint here measured SLOWER at
    * sf1 (block-manager write + read per consumer vs shuffle-file reads:
    * q31 12.3 vs 13.7 s). Deliberately not a broadcast anti-join of
    * the hot set: the hot-shingle count is only bounded by rows/cap, which
    * at 100 TB can exceed any broadcast budget.
    */
  def dfCappedShingles(sh0: DataFrame, dfCap: Int): DataFrame = {
    // repartition on the join/groupBy key BEFORE materializing: the
    // GramKeys index arrives map-side (scan partitioning — possibly a
    // handful of file splits), and checkpointing it that way serializes
    // every downstream shuffle WRITE through those few tasks (q33 at sf1
    // measured 2.3x slower). One explicit hash shuffle restores full
    // write parallelism and co-partitions the index with everything
    // downstream keyed on s.
    val sh = sh0.repartition(col("s"))
    val keep = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select("s")
    sh.join(keep, "s").select(col("doc_id"), col("s"))
  }

  /** MinHash+LSH near-dup pairs over a normalized (doc_id, norm) frame —
    * the reusable core of q31 (see its doc for the banding scheme).
    * MinHash signatures run over the RAW shingle multiset (map-side, no
    * join — hot shingles cost nothing there); the exact-Jaccard refinement
    * runs over the df-capped index.
    */
  def minhashPairs(norm: DataFrame, threshold: Double,
      dfCap: Int = DfCap): DataFrame = {
    // dfCappedShingles exchanges the raw index internally; the capped
    // lineage each jaccardOf consumer replays from that reused exchange
    // is just the df groupBy+join, which measured cheaper than
    // materializing the capped frame a second time
    val sh = dfCappedShingles(hashedShinglesOf(norm), dfCap)
    jaccardOf(bandCandidates(norm), sh, threshold)
  }

  /** LSH band-bucket candidate pairs (i < j, distinct) for a normalized
    * frame — the banding stage of [[minhashPairs]], exposed so the
    * streaming form ([[graft.streaming.DocStreams.nearDupCandidates]])
    * can assert convergence against the exact batch candidate set.
    * Signatures are map-side via the native MinHash4 expression: min over
    * the shingle multiset == min over the set, so no explode/distinct/
    * groupBy shuffle is needed on the signature path.
    */
  private[graft] def bandCandidates(norm: DataFrame): DataFrame = {
    // pinned behind one exchange on the join keys: a self-join duplicates
    // its non-exchange subtree, so without this the scan + normalize +
    // MinHash4 map pipeline (the expensive part — md5 per shingle × 4
    // seeds) runs once PER SIDE; behind the repartition the second side
    // is a ReusedExchange over 4·N tiny signature rows. digestWide
    // parallelizes the signature map when the scan is narrow (see its doc)
    val bands = digestWide(norm)
      .select(col("doc_id"),
        posexplode(graft.functions.MinHash4(split(col("norm"), " "))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "v")
      .repartition(col("band"), col("v"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
  }

  /** Incremental near-dup detection — the daily-ingest shape at 100 TB:
    * the corpus's band index is a PRE-BUILT stored artifact, and a new
    * batch dedups against it by (a) probing the stored index with the
    * batch's own map-side band signatures (old×new candidates: only the
    * batch streams; the corpus is read, never re-banded in a real
    * pipeline) and (b) a batch self-join (new×new). Old×old pairs are
    * never recomputed. Equivalent to [[minhashPairs]] over the union
    * restricted to pairs touching the new batch — the oracle states
    * exactly that, so a missed candidate class hash-mismatches.
    *
    * Document-frequency caps stay corpus-wide (maintained incrementally in
    * a real pipeline), so the capped-Jaccard agrees with the full run.
    */
  def minhashPairsIncremental(oldNorm: DataFrame, newNorm: DataFrame,
      threshold: Double, dfCap: Int = DfCap): DataFrame = {
    // widen ONCE per input: each widened frame is consumed by BOTH its
    // band map and the union's shingle index, so the two digestWide
    // exchanges are reused instead of three separate ones (the union is
    // already wide, so hashedShinglesOf's own gate no-ops on it —
    // measured at sf1: three exchanges made q116 25% SLOWER than no
    // widening at all; this shape recovers the digest parallelism)
    val oldW = digestWide(oldNorm)
    val newW = digestWide(newNorm)
    val sh = dfCappedShingles(
      hashedShinglesOf(oldW.unionByName(newW)), dfCap)
    def bandsOf(n: DataFrame) = n
      .select(col("doc_id"),
        posexplode(graft.functions.MinHash4(split(col("norm"), " "))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "v")
    val oldBands = bandsOf(oldW) // the stored index in a real pipeline
    // consumed twice (old×new probe + new×new self-join): one exchange,
    // second consumer reuses it instead of re-running the map pipeline
    val newBands = bandsOf(newW).repartition(col("band"), col("v"))
    val oldNew = newBands.as("n")
      .join(oldBands.as("o"),
        col("n.band") === col("o.band") && col("n.v") === col("o.v"))
      .select(
        least(col("o.doc_id"), col("n.doc_id")).as("i"),
        greatest(col("o.doc_id"), col("n.doc_id")).as("j"))
    val newNew = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    jaccardOf(oldNew.unionByName(newNew).distinct(), sh, threshold)
  }

  /** Exact Jaccard for a candidate pair set over the shingle index.
    *
    * Deliberately NOT semi-join-pruned to candidate docs: on this corpus
    * the LSH candidates touch most documents, so a (doc_id)-keyed prune
    * of the index before the refine just adds a shuffle (measured q116
    * sf1 9.9 → 14.6 s when tried). The refine's own equi-joins already
    * skip non-candidate rows hash-side.
    */
  private[graft] def jaccardOf(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("si"), col("i") === col("si.doc_id"))
      .join(sh.as("sj"), col("j") === col("sj.doc_id") && col("si.s") === col("sj.s"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("ni"), col("i") === col("ni.doc_id"))
      .join(sizes.as("nj"), col("j") === col("nj.doc_id"))
      .select(
        col("i"), col("j"),
        round(col("inter") / (col("ni.n") + col("nj.n") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash signatures over a normalized frame — core of q32.
    * One map-side pass via the native [[graft.functions.SimHash16]]
    * expression: no word explode, no shuffle (the composed explode +
    * 16-conditional-sum groupBy formulation measured ~6s at sf0.1; this
    * is sub-second with identical output).
    */
  def simhashOf(norm: DataFrame): DataFrame =
    norm.select(
      col("doc_id"),
      graft.functions.SimHash16(split(col("norm"), " ")).as("simhash"))

  /** Sliding-window chunker over a normalized frame — core of q39.
    * `keep` carries extra input columns onto every chunk row (map-side),
    * so a consumer needing doc metadata never equi-joins it back on.
    */
  def chunksOf(norm: DataFrame, size: Int, overlap: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val step = size - overlap
    val kept = keep.map(col)
    norm
      .withColumn("len", length(col("norm")))
      .select(
        Seq(col("doc_id"), col("norm"),
          explode(sequence(lit(0),
            floor((col("len") - 1) / lit(step.toDouble)).cast("int")))
            .as("chunk_idx")) ++ kept: _*)
      .select(
        Seq(col("doc_id"),
          col("chunk_idx"),
          col("norm").substr(col("chunk_idx") * step + 1, lit(size))
            .as("chunk")) ++ kept: _*)
      .withColumn("chunk_len", length(col("chunk")))
  }

  /** Oracle-side shingle CTE (DuckDB). `range` can't see lateral columns, so
    * the index grid is a cross join filtered by word count; its bound is the
    * corpus max word count (uncorrelated scalar subquery), so no document —
    * however long — can silently fall outside the grid.
    */
  private[operators] val sqlShingles: String =
    s"""
    norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
    words AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM words CROSS JOIN (SELECT CAST(unnest(range(1,
        1 + (SELECT max(len(ws)) FROM words))) AS INT) AS i) r
      WHERE len(ws) >= 3 AND i <= len(ws) - 2)
    """

  /** Oracle-side df-capped shingle index `shc` (mirrors [[dfCappedShingles]]);
    * `sh` is already distinct per (doc_id, s), so count(*) is the df.
    */
  private val sqlShinglesCapped: String =
    s"""$sqlShingles,
    shh AS (
      SELECT DISTINCT doc_id, ${sqlHashGram("s")} AS s FROM sh),
    shc AS (
      SELECT shh.doc_id, shh.s FROM shh
      JOIN (SELECT s FROM shh GROUP BY s HAVING count(*) <= $DfCap) ok
        ON ok.s = shh.s)
    """

  // ---------------------------------------------------------------------
  // Dedup
  // ---------------------------------------------------------------------

  /** Exact dedup: hash-groupBy on the normalized content hash. At scale this
    * is one shuffle on a 32-hex key with map-side combine; the keeper is the
    * min doc_id (deterministic).
    */
  val q30DedupExact = Q(
    "q30_dedup_exact",
    (s, d) =>
      docsNorm(s, d)
        .groupBy(md5(col("norm")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
    Some(s"""
      SELECT md5(${sqlNorm("text")}) AS content_hash,
             min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM documents
      GROUP BY 1
    """),
  )

  /** Exact-dedup APPLICATION — the step q30 feeds: keep one canonical row
    * (min doc_id) per normalized-content hash and drop the rest, returning
    * the deduplicated corpus. Two shuffles at any scale: the keeper
    * aggregate on the 32-hex key, then a join back on doc_id (both
    * map-side combinable / AQE-coalesced). The catalog query aggregates
    * the result per language so the oracle hash-compares compactly.
    */
  def dedupApply(docs: DataFrame): DataFrame = {
    val kept = normDocs(docs)
      .groupBy(md5(col("norm")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(kept, Seq("doc_id"))
  }

  val q95DedupApply = Q(
    "q95_dedup_apply",
    (s, d) =>
      dedupApply(Tables.documents(s, d))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("total_chars")),
    Some(s"""
      WITH keep AS (
        SELECT min(doc_id) AS doc_id
        FROM (SELECT doc_id, md5(${sqlNorm("text")}) AS h FROM documents)
        GROUP BY h)
      SELECT lang, count(*) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents JOIN keep USING (doc_id)
      GROUP BY lang
    """),
  )

  /** MinHash + LSH near-dup pairs. k=4 seeded minhashes over word 3-gram
    * shingles (minhash value = min md5 of the seeded shingle — identical in
    * both engines); each minhash is its own LSH band (OR-construction →
    * high recall). Candidate pairs come from an equi-join on (band, value) —
    * the only pairs ever materialized — then exact Jaccard over the shingle
    * inverted index keeps pairs ≥ 0.015.
    *
    * Scale: shuffle keys are band values and shingles; shingles with
    * document frequency above [[DfCap]] are dropped from the refinement
    * index ([[dfCappedShingles]]), so a degenerate corpus (one viral
    * shingle in every doc) can't make the refinement join quadratic.
    * Never all-pairs.
    */
  val q31DedupMinhash = Q(
    "q31_dedup_minhash",
    (s, d) => minhashPairs(docsNorm(s, d), 0.015),
    Some(s"""
      WITH $sqlShinglesCapped,
      mh AS (
        SELECT doc_id,
               min(md5('0|' || s)) AS mh0, min(md5('1|' || s)) AS mh1,
               min(md5('2|' || s)) AS mh2, min(md5('3|' || s)) AS mh3
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 AS v FROM mh UNION ALL
        SELECT doc_id, 1, mh1 FROM mh UNION ALL
        SELECT doc_id, 2, mh2 FROM mh UNION ALL
        SELECT doc_id, 3, mh3 FROM mh),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      inter AS (
        SELECT c.i, c.j, count(*) AS inter
        FROM cand c
        JOIN shc si ON si.doc_id = c.i
        JOIN shc sj ON sj.doc_id = c.j AND sj.s = si.s
        GROUP BY c.i, c.j)
      SELECT t.i, t.j,
             round(inter * 1.0 / (ni.n + nj.n - inter), 6) AS jaccard
      FROM inter t
      JOIN sizes ni ON ni.doc_id = t.i
      JOIN sizes nj ON nj.doc_id = t.j
      WHERE round(inter * 1.0 / (ni.n + nj.n - inter), 6) >= 0.015
    """),
  )

  /** q116 — [[minhashPairsIncremental]] over a deterministic old/new corpus
    * split (new = doc_id % 5 = 0). The oracle is the FULL q31 pair set
    * restricted to pairs touching the new batch — incremental must find
    * exactly what a full rerun would, minus the old×old work.
    */
  val q116DedupIncremental = Q(
    "q116_dedup_incremental",
    (s, d) => {
      val norm = docsNorm(s, d)
      val isNew = col("doc_id") % 5 === 0
      minhashPairsIncremental(norm.filter(!isNew), norm.filter(isNew), 0.015)
    },
    Some(s"""
      WITH $sqlShinglesCapped,
      mh AS (
        SELECT doc_id,
               min(md5('0|' || s)) AS mh0, min(md5('1|' || s)) AS mh1,
               min(md5('2|' || s)) AS mh2, min(md5('3|' || s)) AS mh3
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 AS v FROM mh UNION ALL
        SELECT doc_id, 1, mh1 FROM mh UNION ALL
        SELECT doc_id, 2, mh2 FROM mh UNION ALL
        SELECT doc_id, 3, mh3 FROM mh),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      inter AS (
        SELECT c.i, c.j, count(*) AS inter
        FROM cand c
        JOIN shc si ON si.doc_id = c.i
        JOIN shc sj ON sj.doc_id = c.j AND sj.s = si.s
        GROUP BY c.i, c.j)
      SELECT t.i, t.j,
             round(inter * 1.0 / (ni.n + nj.n - inter), 6) AS jaccard
      FROM inter t
      JOIN sizes ni ON ni.doc_id = t.i
      JOIN sizes nj ON nj.doc_id = t.j
      WHERE round(inter * 1.0 / (ni.n + nj.n - inter), 6) >= 0.015
        AND (t.i % 5 = 0 OR t.j % 5 = 0)
    """),
  )

  /** Near-dup CLUSTERING — the step after pair-finding in a dedup
    * pipeline: connected components over the q31 similarity pairs, each
    * doc labeled with the minimum doc_id in its component (the canonical
    * keeper). Min-label propagation with a pointer-jumping shortcut,
    * converging in O(log diameter) rounds; convergence is detected by a
    * monotone potential (labels only decrease, so Σlabel is strictly
    * decreasing until the fixpoint).
    *
    * This is the ONE deliberately RDD-based operator in the engine — the
    * canonical iterative-graph case (GraphX's own territory) where
    * Catalyst is the wrong substrate, for a structural reason that grows
    * with scale: a DataFrame loop re-plans, re-compiles codegen, and
    * re-SHUFFLES the full edge set against the labels every round
    * (or broadcasts the labels, impossible at 100 TB), whereas hash-
    * partitioning the adjacency ONCE makes every round's edge⋈label join
    * narrow — only the label messages move per round. Measured at sf0.1:
    * 3.4s vs 7.4s for the best checkpointed-DataFrame formulation, with
    * identical per-round potentials. Partition count scales with the
    * measured edge count (~250k edges/partition), so the same loop runs
    * 1000-way parallel on a 100 TB-derived pair set.
    */
  def dedupClusters(pairs: DataFrame): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the pair-finding ONCE — an unbroken lineage would re-run
    // the whole MinHash+Jaccard pipeline per iteration (measured 70s vs ~3s
    // at sf0.1). Everything after this line works on (Long, Long) RDDs.
    val e0 = pairs.select(col("i"), col("j")).as[(Long, Long)].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e0.count()
    // Bounded-graph fast path (the q157 driver-local-iteration stance):
    // the edge list is ALREADY materialized and counted to drive the
    // distributed loop, so when it is driver-sized the exact same
    // connected components come out of a local union-find in one collect —
    // no 10-round × 2-shuffle RDD iteration whose per-round launch+GC
    // floor dominates at every benched SF (q34 sf1: 18 s of loop over a
    // graph that union-finds in milliseconds). The cap is conf-planted
    // for tests and closes at real scale (default 8M edges ≈ 128 MB
    // packed on the driver — the same order as one broadcast build);
    // past it the distributed label-propagation + pointer-jumping loop
    // below runs unchanged, so 100 TB pair volumes never touch the
    // driver. Union by size with per-root min-id tracking gives exactly
    // the loop's fixpoint: canonical_id = component min, one row per
    // component.
    val localEdgeCap = spark.conf
      .get("graft.cc.localEdgeCap", (8L << 20).toString).toLong
    if (nEdges <= localEdgeCap) {
      val packed = e0.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (i, j) => b += i; b += j }
        Iterator.single(b.result())
      }.collect()
      e0.unpersist(true)
      val idx = new java.util.HashMap[Long, Int]()
      packed.foreach { arr =>
        var k = 0
        while (k < arr.length) {
          if (!idx.containsKey(arr(k))) idx.put(arr(k), idx.size)
          k += 1
        }
      }
      val n = idx.size
      val parent = Array.tabulate(n)(identity)
      val rank = new Array[Int](n)
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      packed.foreach { arr =>
        var k = 0
        while (k < arr.length) {
          val a = find(idx.get(arr(k)))
          val b = find(idx.get(arr(k + 1)))
          if (a != b) {
            if (rank(a) < rank(b)) parent(a) = b
            else if (rank(b) < rank(a)) parent(b) = a
            else { parent(b) = a; rank(a) += 1 }
          }
          k += 2
        }
      }
      val minId = new java.util.HashMap[Int, Long]()
      val size = new java.util.HashMap[Int, Long]()
      idx.forEach { (node, i) =>
        val r = find(i)
        val m = minId.get(r)
        if (!minId.containsKey(r) || node < m) minId.put(r, node)
        size.merge(r, 1L, _ + _)
      }
      val rows = minId.entrySet().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (rows.hasNext) {
        val e = rows.next()
        buf += ((e.getValue, size.get(e.getKey)))
      }
      return buf.toSeq.toDF("canonical_id", "cluster_size")
    }
    val part = new HashPartitioner(math.max(1, (nEdges * 2 / 250000L).toInt))
    // adjacency keyed by message SOURCE (j sends its label to i), both
    // directions, partitioned once and reused by every round's narrow join
    // loop-state caches are SERIALIZED (VERDICT r9 #3): deserialized
    // (Long,Long) caches are ~3 boxed objects per record living in the
    // old generation across ~10 rounds × 2 RDDs — the measured 21–32 s
    // sf1 median spread was full-GC churn, not compute. Serialized
    // partitions are single byte arrays (old-gen friendly); the per-round
    // decode cost is noise at label-propagation sizes.
    val loopLevel = StorageLevel.MEMORY_AND_DISK_SER
    val adj = e0.flatMap { case (i, j) => Seq(j -> i, i -> j) }
      .partitionBy(part)
      .persist(loopLevel)
    var labels = adj.keys.distinct(part.numPartitions).map(n => n -> n)
      .partitionBy(part).persist(loopLevel)
    val minL = (a: Long, b: Long) => math.min(a, b)
    def potential(rdd: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
      rdd.values.map(BigInt(_)).fold(BigInt(0))(_ + _)
    var pot = potential(labels) // materializes labels → adj → e0
    // e0 fed only adj (already cached) and the edge count — release the
    // loop's biggest cache BEFORE iterating, blocking so the heap is
    // actually free when round 1 allocates
    e0.unpersist(true)
    var converged = false
    var iter = 0
    while (!converged && iter < 30) {
      // neighbor-min: adj⋈labels is narrow (co-partitioned); appending the
      // labels themselves folds each node's own label into the min, so
      // labels are monotone non-increasing (without it they oscillate).
      // One shuffle: the reduceByKey on the message stream.
      // persisted: the pointer jump consumes prop TWICE (as the message
      // stream and as the lookup side of its self-join) — unpersisted,
      // each consumer re-reduces the propagation shuffle every round
      val prop = (adj.join(labels)
        .map { case (_, (dst, lbl)) => dst -> lbl } ++ labels)
        .reduceByKey(part, minL)
        .persist(loopLevel)
      // pointer jump: label ← label(label), halving chain depth per round;
      // left join because a fully-propagated label (the component min) is
      // its own node and may carry no entry distinct from itself.
      val jump = prop.map { case (n, l) => l -> n }
        .partitionBy(part)
        .leftOuterJoin(prop)
        .map { case (l, (n, ll)) => n -> ll.getOrElse(l) }
        .reduceByKey(part, minL)
        .persist(loopLevel)
      val npot = potential(jump) // also materializes jump's cache
      converged = npot == pot
      pot = npot
      // BLOCKING unpersists: async removal lets dead rounds' blocks pile
      // up in the old gen while the next round allocates — the other half
      // of the GC-variance fix
      prop.unpersist(true)
      labels.unpersist(true)
      labels = jump
      iter += 1
    }
    val out = labels.map { case (_, l) => l -> 1L }
      .reduceByKey((a: Long, b: Long) => a + b)
      .toDF("canonical_id", "cluster_size")
      .localCheckpoint(true)
    adj.unpersist(true)
    labels.unpersist(true)
    out
  }

  /** q34's oracle-side connected components: BOUNDED unrolled
    * min-label-propagation + pointer-jumping rounds (VERDICT r10 #4). The
    * previous recursive-CTE walk enumerated every descending label PATH —
    * exponential blowup on dense near-dup cliques, DNF (>900 s) at sf1 —
    * while this form is `Rounds` × two self-joins over node-count rows.
    * Each round moves every node's label to the min over its closed
    * neighborhood, then jumps label ← label(label); reach at least doubles
    * per round, so `Rounds`=16 guarantees reach ≥ 16 hops (and typically ~2^16) —
    * near-dup clusters are dense cliques of measured diameter ≤ 4 at
    * sf0.1/sf1, and an unconverged oracle can't pass silently (its labels
    * would differ from the engine's fixpoint and fail the hash).
    */
  private def sqlLabelProp(rounds: Int): String = {
    // every a_k/l_k is referenced TWICE — AS MATERIALIZED stops DuckDB's
    // CTE inlining from expanding the round chain 2^rounds-fold
    val steps = (1 to rounds).map { k =>
      s"""a$k AS MATERIALIZED (
        SELECT p.node, least(p.label, coalesce(m.ml, p.label)) AS label
        FROM l${k - 1} p LEFT JOIN (
          SELECT e.i AS node, min(pl.label) AS ml
          FROM edges e JOIN l${k - 1} pl ON pl.node = e.j
          GROUP BY e.i) m ON m.node = p.node),
      l$k AS MATERIALIZED (
        SELECT a.node, least(a.label, coalesce(t.label, a.label)) AS label
        FROM a$k a LEFT JOIN a$k t ON t.node = a.label)"""
    }.mkString(",\n      ")
    s"""l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
      $steps"""
  }

  val q34DedupClusters = Q(
    "q34_dedup_clusters",
    (s, d) => dedupClusters(minhashPairs(docsNorm(s, d), 0.015)),
    Some(s"""
      WITH $sqlShinglesCapped,
      mh AS (
        SELECT doc_id,
               min(md5('0|' || s)) AS mh0, min(md5('1|' || s)) AS mh1,
               min(md5('2|' || s)) AS mh2, min(md5('3|' || s)) AS mh3
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 AS v FROM mh UNION ALL
        SELECT doc_id, 1, mh1 FROM mh UNION ALL
        SELECT doc_id, 2, mh2 FROM mh UNION ALL
        SELECT doc_id, 3, mh3 FROM mh),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      inter AS (
        SELECT c.i, c.j, count(*) AS inter
        FROM cand c
        JOIN shc si ON si.doc_id = c.i
        JOIN shc sj ON sj.doc_id = c.j AND sj.s = si.s
        GROUP BY c.i, c.j),
      pairs AS (
        SELECT t.i, t.j
        FROM inter t
        JOIN sizes ni ON ni.doc_id = t.i
        JOIN sizes nj ON nj.doc_id = t.j
        WHERE round(inter * 1.0 / (ni.n + nj.n - inter), 6) >= 0.015),
      edges AS MATERIALIZED (SELECT i, j FROM pairs UNION SELECT j, i FROM pairs),
      nodes AS (SELECT DISTINCT i AS node FROM edges),
      ${sqlLabelProp(16)}
      SELECT label AS canonical_id, count(*) AS cluster_size
      FROM l16 GROUP BY label
    """),
  )

  /** SimHash fingerprint: 16-bit signature per doc. Bit b is the sign of the
    * sum over word occurrences of ±1, where the sign is the top bit of hex
    * digit b of md5(word) (digit ≥ '8'; ASCII order makes the comparison
    * identical in both engines). A pure map-side computation. Pairing within
    * Hamming distance r happens by banding the 16 bits (see PipelineSpec);
    * the fingerprint itself is the catalog-checked artifact.
    */
  /** Oracle-side simhash CTE `sh16` (doc_id, simhash) — shared by q32/q97.
    * Empty tokens are filtered (DuckDB's string_split('', ' ') yields [''])
    * to mirror SimHash16/64's zero-length-word skip, and the LEFT JOIN back
    * to `norm` keeps empty-norm docs with the same all-zero signature the
    * Spark expressions emit for a wordless document.
    */
  private val sqlSimhash: String =
    s"""norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (
        SELECT doc_id, md5(w) AS h FROM (
          SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM norm)
        WHERE w <> ''),
      bits AS (
        SELECT doc_id,
          ${(0 until 16).map(b =>
            s"SUM(CASE WHEN substr(h, ${b + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$b")
            .mkString(",\n          ")}
        FROM w GROUP BY doc_id),
      sh16 AS (
        SELECT norm.doc_id,
          ${(0 until 16).map(b => s"CASE WHEN s$b > 0 THEN '1' ELSE '0' END").mkString(" || ")}
          AS simhash
        FROM norm LEFT JOIN bits USING (doc_id))"""

  val q32Simhash = Q(
    "q32_simhash",
    (s, d) => simhashOf(docsNorm(s, d)),
    Some(s"""
      WITH $sqlSimhash
      SELECT doc_id, simhash FROM sh16
    """),
  )

  /** 64-bit SimHash signatures — the scale fingerprint behind q97 (q32's
    * 16-bit form stays as the reference-class artifact; 16-bit bands are
    * far too coarse to bound band-join candidates — see [[graft.functions.SimHash64]]).
    */
  def simhash64Of(norm: DataFrame): DataFrame =
    norm.select(
      col("doc_id"),
      graft.functions.SimHash64(split(col("norm"), " ")).as("sim64"))

  /** Oracle-side 64-bit simhash CTE `sh64` (doc_id, sim64): bit b of
    * md5 = bit 3−(b mod 4) of hex digit b/4.
    */
  private val sqlSimhash64: String = {
    val sums = (0 until 64).map { b =>
      val digit = b / 4 + 1
      val mask = 1 << (3 - b % 4)
      s"SUM(CASE WHEN (strpos('0123456789abcdef', substr(h, $digit, 1)) - 1) & $mask <> 0 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n          ")
    s"""norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (
        SELECT doc_id, md5(w) AS h FROM (
          SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM norm)
        WHERE w <> ''),
      bits AS (
        SELECT doc_id,
          $sums
        FROM w GROUP BY doc_id),
      sh64 AS (
        SELECT norm.doc_id,
          ${(0 until 64).map(b => s"CASE WHEN s$b > 0 THEN '1' ELSE '0' END").mkString(" || ")}
          AS sim64
        FROM norm LEFT JOIN bits USING (doc_id))"""
  }

  /** SimHash near-dup PAIRS — the step after fingerprinting: 4 bands of 16
    * bits over the 64-bit signature, candidates from the band equi-join,
    * refined by exact Hamming ≤ 3. By pigeonhole the banding is COMPLETE
    * for this radius (3 differing bits dirty at most 3 of the 4 bands, so
    * one band always matches), and with 2^16 buckets per band the join
    * stays selective at any corpus size — candidates only ever come from
    * equi-joins on (band, value), never all-pairs.
    */
  val q97SimhashPairs = Q(
    "q97_simhash_pairs",
    (s, d) => {
      // the 16-bit band slices double as PACKED INTS (conv base-2), so the
      // Hamming refinement is 4×bit_count(xor) instead of a 64-term
      // compare chain (the chain's codegen blows the JVM method budget and
      // falls back to interpreted eval — measured 13.5s vs ~2s at sf0.1)
      val sh = simhash64Of(docsNorm(s, d))
        .select(Seq(col("doc_id"), col("sim64")) ++
          (0 until 4).map(k =>
            conv(substring(col("sim64"), k * 16 + 1, 16), 2, 10)
              .cast("long").as(s"p$k")): _*)
        .localCheckpoint(true)
      val bands = sh.select(
        Seq(col("doc_id")) ++ (0 until 4).map(k => col(s"p$k")) :+
          posexplode(array((0 until 4).map(k =>
            substring(col("sim64"), k * 16 + 1, 16)): _*)): _*)
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "v")
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.v") === col("b.v")
            && col("a.doc_id") < col("b.doc_id"))
        .select(Seq(col("a.doc_id").as("i"), col("b.doc_id").as("j")) ++
          (0 until 4).flatMap(k =>
            Seq(col(s"a.p$k").as(s"ai$k"), col(s"b.p$k").as(s"bj$k"))): _*)
        .distinct()
      val ham = (0 until 4)
        .map(k => expr(s"bit_count(ai$k ^ bj$k)"))
        .reduce(_ + _)
      cand.select(col("i"), col("j"), ham.cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
    },
    Some {
      val hamSql = (1 to 64).map(b =>
        s"CASE WHEN substr(hi, $b, 1) <> substr(hj, $b, 1) THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH $sqlSimhash64,
      bands AS (
        ${(0 until 4).map(k =>
          s"SELECT doc_id, sim64, $k AS band, substr(sim64, ${k * 16 + 1}, 16) AS v FROM sh64")
          .mkString("\n        UNION ALL\n        ")}),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, a.sim64 AS hi,
                        b.doc_id AS j, b.sim64 AS hj
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id)
      SELECT i, j, $hamSql AS hamming
      FROM cand
      WHERE $hamSql <= 3
    """
    },
  )

  /** N-gram Jaccard similarity via the shingle inverted index: pairs sharing
    * ≥1 shingle (equi-join on the shingle), exact Jaccard, threshold 0.02.
    * The exact counterpart to q31's LSH approximation — at 100 TB you run
    * q31; this is the precision oracle and the small-corpus path. The
    * self-join runs over the df-capped index ([[dfCappedShingles]]): without
    * the cap, one shingle present in df documents alone contributes df²/2
    * candidate rows, which is quadratic on precisely the shingles that
    * carry no similarity signal.
    */
  val q33NgramJaccard = Q(
    "q33_ngram_jaccard",
    (s, d) => {
      // raw index exchanged once inside dfCappedShingles; the three
      // consumers (both self-join sides + sizes) reuse that exchange and
      // replay only the cap join
      val sh = dfCappedShingles(hashedShinglesOf(docsNorm(s, d)), DfCap)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("ni"), col("i") === col("ni.doc_id"))
        .join(sizes.as("nj"), col("j") === col("nj.doc_id"))
        .select(col("i"), col("j"),
          round(col("inter") / (col("ni.n") + col("nj.n") - col("inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.02)
    },
    Some(s"""
      WITH $sqlShinglesCapped,
      sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT t.i, t.j,
             round(inter * 1.0 / (ni.n + nj.n - inter), 6) AS jaccard
      FROM inter t
      JOIN sizes ni ON ni.doc_id = t.i
      JOIN sizes nj ON nj.doc_id = t.j
      WHERE round(inter * 1.0 / (ni.n + nj.n - inter), 6) >= 0.02
    """),
  )

  /** N-gram CONTAINMENT — the asymmetric companion to Jaccard (q33):
    * C(A→B) = |A∩B| / |A| flags excerpt/quote inclusion, where a short
    * document sits wholly inside a long one. Symmetric Jaccard misses
    * exactly that case (|A∩B|/|A∪B| → |A|/|B| → 0 as the host grows), and
    * it is the dominant duplication mode in web training corpora (quoted
    * articles, boilerplate-wrapped reposts). Same df-capped inverted index
    * and equi-join shape as q33 — the unordered intersection is computed
    * ONCE (i < j) and exploded into both directions before normalizing by
    * the source side's own shingle count, so the quadratic self-join work
    * is not doubled.
    */
  /** Directed containment pairs over a (doc_id, norm) frame — the reusable
    * core of q126.
    */
  def containmentPairs(norm: DataFrame, threshold: Double,
      dfCap: Int = DfCap): DataFrame = {
    val sh = dfCappedShingles(hashedShinglesOf(norm), dfCap)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
    val directed = inter
      .unionByName(inter.select(col("j").as("i"), col("i").as("j"), col("inter")))
    directed
      .join(sizes, col("i") === col("doc_id"))
      .select(col("i"), col("j"),
        round(col("inter") / col("n"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  val q126NgramContainment = Q(
    "q126_ngram_containment",
    (s, d) => containmentPairs(docsNorm(s, d), 0.2),
    Some(s"""
      WITH $sqlShinglesCapped,
      sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      directed AS (
        SELECT i, j, inter FROM inter
        UNION ALL
        SELECT j AS i, i AS j, inter FROM inter)
      SELECT t.i, t.j,
             round(t.inter * 1.0 / sz.n, 6) AS containment
      FROM directed t JOIN sizes sz ON sz.doc_id = t.i
      WHERE round(t.inter * 1.0 / sz.n, 6) >= 0.2
    """),
  )

  // ---------------------------------------------------------------------
  // Text analysis
  // ---------------------------------------------------------------------

  private val langs = Seq("en", "es", "fr", "de", "zh")
  private val langStop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  /** Language ID by stopword-hit counting: score per language = word tokens
    * in that language's stopword list; prediction = argmax with
    * first-in-list tiebreak (en > es > fr > de > zh), 'und' when no hits.
    * Pure map-side + one group-by shuffle on doc_id.
    */
  def langIdOf(norm: DataFrame): DataFrame = {
    val base = norm
      .select(col("doc_id"), explode(split(col("norm"), " ")).as("w"))
    val scCols = langs.map(l =>
      sum(when(col("w").isin(langStop(l): _*), 1).otherwise(0)).as(s"sc_$l"))
    val scored = base.groupBy("doc_id").agg(scCols.head, scCols.tail: _*)
    val maxScore = greatest(langs.map(l => col(s"sc_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"sc_$l") === maxScore && maxScore > 0, l).otherwise(acc)
    }
    scored.select(col("doc_id"), pred.as("pred_lang"))
  }

  val q35LangId = Q(
    "q35_lang_id",
    (s, d) => langIdOf(docsNorm(s, d)),
    Some {
      def inList(l: String) = langStop(l).map(w => s"'$w'").mkString(", ")
      s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM norm),
      sc AS (
        SELECT doc_id,
          ${langs.map(l => s"SUM(CASE WHEN w IN (${inList(l)}) THEN 1 ELSE 0 END) AS sc_$l")
            .mkString(",\n          ")}
        FROM w GROUP BY doc_id),
      m AS (SELECT *, greatest(${langs.map(l => s"sc_$l").mkString(", ")}) AS mx FROM sc)
      SELECT doc_id,
        CASE ${langs.map(l => s"WHEN sc_$l = mx AND mx > 0 THEN '$l'").mkString(" ")}
             ELSE 'und' END AS pred_lang
      FROM m
      """
    },
  )

  /** Quality scoring: length, token count, punctuation ratio, stopword
    * ratio, mean token length, and a composite score — the standard cheap
    * pre-filter features of a training-data pipeline. All map-side.
    */
  val q36TextQuality = Q(
    "q36_text_quality",
    (s, d) => {
      val allStop = langStop.values.flatten.toSeq
      docsNorm(s, d)
        .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("ws"))
        .select(
          col("doc_id"),
          length(col("norm")).as("n_chars"),
          size(col("ws")).as("n_tokens"),
          round(
            (length(col("norm")) - length(regexp_replace(col("norm"), "[\\p{Punct}]", "")))
              / length(col("norm")).cast("double"), 6).as("punct_ratio"),
          round(
            size(filter(col("ws"), w => w.isin(allStop: _*)))
              / size(col("ws")).cast("double"), 6).as("stopword_ratio"),
          round(
            (length(col("norm")) - size(col("ws")) + 1)
              / size(col("ws")).cast("double"), 6).as("avg_token_len"))
        .withColumn("quality",
          round(
            when(col("n_tokens") >= 20, 1.0).otherwise(col("n_tokens") / 20.0)
              * (lit(1.0) - col("punct_ratio")), 6))
    },
    Some {
      val allStop = langStop.values.flatten.map(w => s"'$w'").mkString(", ")
      s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      t AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM norm),
      f AS (
        SELECT doc_id,
               CAST(length(norm) AS INT) AS n_chars,
               CAST(len(ws) AS INT) AS n_tokens,
               round((length(norm) - length(regexp_replace(norm, '[[:punct:]]', '', 'g')))
                     / CAST(length(norm) AS DOUBLE), 6) AS punct_ratio,
               round(len(list_filter(ws, w -> w IN ($allStop)))
                     / CAST(len(ws) AS DOUBLE), 6) AS stopword_ratio,
               round((length(norm) - len(ws) + 1) / CAST(len(ws) AS DOUBLE), 6) AS avg_token_len
        FROM t)
      SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio, avg_token_len,
             round((CASE WHEN n_tokens >= 20 THEN 1.0 ELSE n_tokens / 20.0 END)
                   * (1.0 - punct_ratio), 6) AS quality
      FROM f
      """
    },
  )

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate — a
    * regex over letter runs / digit runs / other symbols, with each run
    * counted as ceil(len/4) subword units (the ~4-chars-per-token
    * heuristic). Map-side.
    */
  val q37TokenCount = Q(
    "q37_token_count",
    (s, d) =>
      docsNorm(s, d)
        .select(col("doc_id"),
          graft.functions.TokenStats(col("norm")).as("t"))
        .select(col("doc_id"), col("t.ws_tokens"), col("t.re_tokens"),
          col("t.bpe_est")),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents)
      SELECT doc_id,
             CAST(len(string_split(norm, ' ')) AS INT) AS ws_tokens,
             CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens,
             CAST(list_sum(list_transform(
                    regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'),
                    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_est
      FROM norm
    """),
  )

  /** Document fingerprinting: winnowing-lite — md5 of the full normalized
    * text plus a positional fingerprint from 4 evenly spaced 16-char
    * windows (floor-exact start positions in both engines). Map-side.
    */
  val q38Fingerprint = Q(
    "q38_fingerprint",
    (s, d) => {
      val n = docsNorm(s, d).withColumn("len", length(col("norm")))
      val win = (0 until 4).map { k =>
        col("norm").substr(
          floor((col("len") - 16) * k / lit(3.0)).cast("int") + 1,
          lit(16))
      }
      n.select(
        col("doc_id"),
        md5(col("norm")).as("full_hash"),
        md5(concat(win: _*)).as("pos_fingerprint"))
    },
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      n AS (SELECT doc_id, norm, length(norm) AS len FROM norm)
      SELECT doc_id,
             md5(norm) AS full_hash,
             md5(${(0 until 4)
               .map(k => s"substr(norm, CAST(floor((len - 16) * $k / 3.0) AS INT) + 1, 16)")
               .mkString(" || ")}) AS pos_fingerprint
      FROM n
    """),
  )

  /** Sliding-window chunker — ref J1 (`api/ingest_docs.py:44-62`): size 200,
    * overlap 40, step 160; chunk k covers [160k, 160k+200). flatMap-style
    * explode, distributed by document.
    */
  val q39Chunker = Q(
    "q39_chunker",
    (s, d) => chunksOf(docsNorm(s, d), size = 200, overlap = 40),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      n AS (SELECT doc_id, norm, length(norm) AS len FROM norm),
      idx AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx
        FROM n CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
        WHERE i * 160 < len)
      SELECT idx.doc_id, chunk_idx,
             substr(n.norm, chunk_idx * 160 + 1, 200) AS chunk,
             CAST(length(substr(n.norm, chunk_idx * 160 + 1, 200)) AS INT) AS chunk_len
      FROM idx JOIN n ON idx.doc_id = n.doc_id
    """),
  )

  /** Segment-level dedup with in-place document reassembly — the CCNet /
    * RefinedWeb "line dedup" pass, which removes boilerplate REGIONS
    * (headers, navboxes, license blurbs) that whole-document and near-dup
    * passes structurally miss: a document survives, but every 200-char
    * segment seen earlier in the corpus is cut out of it. First occurrence
    * wins globally, ordered by (doc_id, chunk_idx). Scale shape: the keeper
    * choice is a `min(struct)` AGGREGATE on the segment key — partial-agg
    * reduces map-side and no per-key row buffer exists anywhere (a
    * row_number window would buffer each segment group; a hyper-duplicated
    * boilerplate segment then skews a whole task). Reassembly is per-doc
    * `array_sort(collect_list)` — bounded by a single document's size, the
    * same bound every per-doc operator here carries.
    */
  private[graft] def segmentDedup(norm: DataFrame): DataFrame = {
    // width scales with the input ([[graft.core.ScaleWidth]], q132's
    // rationale): the session conf width oversizes small corpora into
    // per-task overhead and undersizes 100 TB ones
    val p = graft.core.ScaleWidth.forInput(norm, 256L << 10)
    // decouple compute parallelism from file layout (a compact corpus file
    // scans as a couple of row groups, serializing normalize+chunk+md5);
    // no-op whenever the scan is already at least as fine as the target
    val normP =
      if (norm.rdd.getNumPartitions < p) norm.repartition(p) else norm
    // segment streams carry (md5-key, doc, idx) ONLY — the 200-char chunk
    // text never shuffles with them (128-bit keys: the q30 exact-dedup
    // collision stance). Keeper choice stays a min(struct) AGGREGATE on
    // the key so a hyper-duplicated boilerplate segment partial-aggregates
    // map-side instead of buffering one task (a row_number window would).
    val seg = chunksOf(normP, size = 200, overlap = 0)
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("k"))
    val keeper = seg
      .groupBy("k")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"))
    val kept = seg
      .join(keeper, "k")
      .withColumn("keep",
        struct(col("doc_id"), col("chunk_idx")) === col("keeper"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("keep"), col("chunk_idx"))))
          .as("kept_idx"))
    // documents rebuilt by re-slicing the original text at the surviving
    // indices — one doc-sized join instead of re-shuffling every chunk
    val rebuilt = array_join(
      transform(col("kept_idx"),
        i => col("norm").substr(i * 200 + lit(1), lit(200))), "")
    kept.join(normP, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_seg"), col("n_kept"),
        length(rebuilt).cast("long").as("clean_len"),
        md5(rebuilt).as("clean_hash"))
  }

  val q133SegmentDedup = Q(
    "q133_segment_dedup",
    (s, d) => segmentDedup(docsNorm(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      n AS (SELECT doc_id, norm, length(norm) AS len FROM norm),
      idx AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx
        FROM n CROSS JOIN (SELECT unnest(range(0,
          1 + CAST((SELECT max(length(norm)) FROM norm) / 200 AS INT))) AS i) r
        WHERE i * 200 < len),
      seg AS (
        SELECT idx.doc_id, chunk_idx,
               substr(n.norm, chunk_idx * 200 + 1, 200) AS chunk
        FROM idx JOIN n ON idx.doc_id = n.doc_id),
      k AS (
        SELECT doc_id, chunk_idx, chunk,
               row_number() OVER (PARTITION BY chunk
                 ORDER BY doc_id, chunk_idx) = 1 AS keep
        FROM seg)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(length(coalesce(string_agg(chunk, '' ORDER BY chunk_idx)
               FILTER (WHERE keep), '')) AS BIGINT) AS clean_len,
             md5(coalesce(string_agg(chunk, '' ORDER BY chunk_idx)
               FILTER (WHERE keep), '')) AS clean_hash
      FROM k
      GROUP BY 1
    """),
  )

  /** Segment-level language ID + per-doc language-mix entropy — the
    * code-switching / wrong-language-span detector a multilingual curation
    * pipeline runs AFTER doc-level lang-id: a document can be dominantly
    * `en` yet carry embedded spans of another language (boilerplate,
    * quotes, spam), which q35's whole-doc argmax structurally hides.
    * 100-char segments are scored with the same stopword argmax as q35;
    * per doc: segment count, distinct predicted languages, the entropy of
    * the segment-language distribution (ln N − Σc·ln c / N — every ln
    * argument an exact integer), and the dominant language + share
    * (max count, language-name tiebreak). Scale shape: explode → two
    * keyed aggregations (segment key, then doc key), partial-agg all the
    * way; the dominant pick is a min(struct) AGGREGATE, never a window.
    */
  private[graft] def langMixOf(norm: DataFrame): DataFrame = {
    val base = chunksOf(norm, size = 100, overlap = 0)
      .select(col("doc_id"), col("chunk_idx"),
        explode(split(col("chunk"), " ")).as("w"))
    val scCols = langs.map(l =>
      sum(when(col("w").isin(langStop(l): _*), 1).otherwise(0)).as(s"sc_$l"))
    val scored = base.groupBy("doc_id", "chunk_idx")
      .agg(scCols.head, scCols.tail: _*)
    val maxScore = greatest(langs.map(l => col(s"sc_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"sc_$l") === maxScore && maxScore > 0, l).otherwise(acc)
    }
    val perLang = scored.select(col("doc_id"), pred.as("seg_lang"))
      .groupBy("doc_id", "seg_lang").agg(count(lit(1)).as("cnt"))
    perLang.groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_seg"),
        count(lit(1)).cast("int").as("n_langs"),
        min(struct((-col("cnt")).as("nc"), col("seg_lang").as("l"))).as("dom"),
        sum(col("cnt") * log(col("cnt"))).as("slc"))
      .select(
        col("doc_id"), col("n_seg"), col("n_langs"),
        round(log(col("n_seg")) - col("slc") / col("n_seg"), 6)
          .as("lang_entropy"),
        col("dom.l").as("dom_lang"),
        round(-col("dom.nc") / col("n_seg").cast("double"), 6).as("dom_share"))
  }

  val q140LangMix = Q(
    "q140_lang_mix",
    (s, d) => langMixOf(docsNorm(s, d)),
    Some {
      def inList(l: String) = langStop(l).map(w => s"'$w'").mkString(", ")
      s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      n AS (SELECT doc_id, norm, length(norm) AS len FROM norm),
      idx AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx
        FROM n CROSS JOIN (SELECT unnest(range(0,
          1 + CAST((SELECT max(length(norm)) FROM norm) / 100 AS INT))) AS i) r
        WHERE i * 100 < len),
      seg AS (
        SELECT idx.doc_id, chunk_idx,
               substr(n.norm, chunk_idx * 100 + 1, 100) AS chunk
        FROM idx JOIN n ON idx.doc_id = n.doc_id),
      w AS (SELECT doc_id, chunk_idx, unnest(string_split(chunk, ' ')) AS w
            FROM seg),
      sc AS (
        SELECT doc_id, chunk_idx,
          ${langs.map(l => s"SUM(CASE WHEN w IN (${inList(l)}) THEN 1 ELSE 0 END) AS sc_$l")
            .mkString(",\n          ")}
        FROM w GROUP BY 1, 2),
      m AS (SELECT *, greatest(${langs.map(l => s"sc_$l").mkString(", ")}) AS mx FROM sc),
      sl AS (
        SELECT doc_id,
          CASE ${langs.map(l => s"WHEN sc_$l = mx AND mx > 0 THEN '$l'").mkString(" ")}
               ELSE 'und' END AS seg_lang
        FROM m),
      pl AS (SELECT doc_id, seg_lang, count(*) AS cnt FROM sl GROUP BY 1, 2),
      d AS (
        SELECT doc_id, seg_lang, cnt,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY cnt DESC, seg_lang) AS rk,
               sum(cnt) OVER (PARTITION BY doc_id) AS n_seg,
               count(*) OVER (PARTITION BY doc_id) AS n_langs,
               sum(cnt * ln(cnt)) OVER (PARTITION BY doc_id) AS slc
        FROM pl)
      SELECT doc_id, CAST(n_seg AS BIGINT) AS n_seg,
             CAST(n_langs AS INT) AS n_langs,
             -- + 0.0 folds IEEE -0.0 (DuckDB round emits it when the
             -- entropy underflows to a tiny negative; Spark's never does)
             round(ln(n_seg) - slc / n_seg, 6) + 0.0 AS lang_entropy,
             seg_lang AS dom_lang,
             round(cnt * 1.0 / n_seg, 6) AS dom_share
      FROM d WHERE rk = 1
      """
    },
  )

  /** Content-defined chunking — the dedup-stable chunker (Rabin/FastCDC
    * family) at WORD granularity: a chunk boundary falls after every word
    * whose hash divides the target size, so an insertion early in a
    * document shifts only the ONE chunk it lands in, where fixed-width
    * chunking (q39/q133) shifts every boundary after it. Word anchors
    * rather than per-character windows: text edits happen at token
    * granularity, and hashing each word once costs ~5× fewer digests than
    * hashing every trailing character window (the first cut did — 37 s at
    * sf1 vs 6 s for this form; a production char-level CDC uses a
    * shift-register gear hash, which has no cross-engine mirror). The
    * boundary test is stateless per word, keeping the whole operator a
    * per-doc array expression — entirely MAP-SIDE, zero shuffles
    * (PlanSpec-asserted), embarrassingly parallel at any corpus size.
    * Emits per-doc chunk stats + the intra-doc distinct-chunk count (the
    * dedup signal CDC exists to expose). Divisor 12 → ~12-word chunks.
    */
  private[graft] def cdcChunks(norm: DataFrame): DataFrame = {
    // one native codegen pass per document (graft.functions.CdcChunkStats)
    // — the composed filter/transform/slice/array_distinct chain ran as
    // CodegenFallback and materialized a chunk-string array per doc; the
    // boundary rule (60-bit md5 gram key % 12 == 0, final boundary at the
    // word count) and every emitted statistic are byte-identical
    norm
      .select(col("doc_id"), split(col("norm"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).as("nw"),
        graft.functions.CdcChunkStats(col("ws")).as("st"))
      .select(
        col("doc_id"),
        col("st.n_chunks").as("n_chunks"),
        col("st.min_words").as("min_words"),
        col("st.max_words").as("max_words"),
        round(col("nw") / col("st.n_chunks").cast("double"), 6)
          .as("avg_words"),
        col("st.n_unique_chunks").as("n_unique_chunks"))
  }

  val q143CdcChunking = Q(
    "q143_cdc_chunking",
    (s, d) => cdcChunks(docsNorm(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM norm),
      b0 AS (
        SELECT doc_id, ws, len(ws) AS nw,
               list_filter(range(1, len(ws) + 1),
                 k -> ${sqlHashGram("ws[k]")} % 12 = 0) AS b0
        FROM w),
      bf AS (
        SELECT doc_id, ws, nw,
               CASE WHEN b0[-1] = nw THEN b0
                    ELSE list_append(b0, nw) END AS b
        FROM b0),
      st AS (
        SELECT doc_id, nw,
               list_transform(b, (e, k) -> e - coalesce(b[k - 1], 0)) AS lens,
               list_transform(b, (e, k) ->
                 array_to_string(list_slice(ws, coalesce(b[k - 1], 0) + 1, e),
                   ' ')) AS chunks
        FROM bf)
      SELECT doc_id,
             CAST(len(lens) AS BIGINT) AS n_chunks,
             CAST(list_min(lens) AS BIGINT) AS min_words,
             CAST(list_max(lens) AS BIGINT) AS max_words,
             round(nw / CAST(len(lens) AS DOUBLE), 6) AS avg_words,
             CAST(len(list_distinct(list_transform(chunks, c -> md5(c))))
               AS BIGINT) AS n_unique_chunks
      FROM st
    """),
  )

  /** Fuzzy key join via DELETION NEIGHBORHOODS (the SymSpell technique) —
    * character-level entity resolution, the missing granularity between
    * exact dedup (q30) and token-set similarity (q31/q33): two keys match
    * at Levenshtein distance ≤ 1 iff their 1-deletion neighborhoods
    * intersect (equal → same string; insert/delete → one is the other's
    * deletion; substitute → deleting the differing position from each
    * yields the same string). Each side therefore emits only len+1 keys —
    * O(len) per row, versus O(alphabet·len) for insertion-expansion or
    * O(n²) for a similarity cross join — and matching is a plain
    * distributed equi-join on those keys; an exact `levenshtein ≤ 1`
    * refine removes the technique's only false positives (two deletions
    * at different positions landing on the same string). The catalog
    * query plants a deterministic typo (8th character deleted) in every
    * 5th document's 24-char title and proves each corrupted probe finds
    * its original. Hot keys arise only from genuinely identical titles —
    * real duplicates, bounded by the dedup rate, not by data volume.
    */
  private[graft] def fuzzyTitleJoin(norm: DataFrame): DataFrame = {
    val titles = norm.select(col("doc_id"), substring(col("norm"), 1, 24).as("t"))
    val probes = titles
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("p_id"),
        concat(substring(col("t"), 1, 7), expr("substr(t, 9)")).as("tc"))
    // deletion keys as a position explode of pure builtin string
    // expressions (i = 0 keeps the string; i in 1..len deletes char i) —
    // an array_union/transform/sequence form runs its lambda as
    // CodegenFallback and builds a per-row key array. Within-row
    // duplicate keys (double letters) only add candidate rows the
    // id-pair distinct below already removes.
    def delKeys(src: DataFrame, id: String, c: String) = src
      .select(col(id), col(c),
        explode(sequence(lit(0), length(col(c)))).as("i"))
      // the join key is the 64-bit hash of the deletion string, not the
      // string: the equi-join and the pair distinct then move/compare
      // 8-byte longs. A hash collision can only ADD a candidate pair,
      // and the exact levenshtein refine below removes it.
      .select(col(id),
        xxhash64(when(col("i") === 0, col(c))
          .otherwise(concat(expr(s"substr($c, 1, i-1)"),
            expr(s"substr($c, i+1)")))).as("k"))
    // late materialization (VERDICT r9 #2): the 25×-exploded key join
    // carries ONLY (id, key) — the 24-char titles would double the
    // exchange volume and widen the distinct to four columns. Candidate
    // pairs dedup on the two longs, then the titles attach via id joins
    // against re-derived (not cached) projections — recompute is a
    // pruned scan + map-side substring, the scale-safe trade against
    // checkpointing a fact-sized frame; the candidate side is bounded
    // by the true match rate, so AQE typically broadcasts it and the
    // refine never re-shuffles the full title frame.
    val oKeys = delKeys(
      titles.select(col("doc_id").as("o_id"), col("t")), "o_id", "t")
    val pKeys = delKeys(probes, "p_id", "tc")
    val cand = oKeys.join(pKeys, "k").select("o_id", "p_id").distinct()
    cand
      .join(titles.select(col("doc_id").as("o_id"), col("t")), "o_id")
      .join(probes.select(col("p_id"), col("tc")), "p_id")
      .withColumn("dist", levenshtein(col("t"), col("tc")))
      .filter(col("dist") <= 1)
      .select(col("o_id"), col("p_id"), col("dist"))
  }

  val q152FuzzyJoin = Q(
    "q152_fuzzy_join",
    (s, d) => fuzzyTitleJoin(docsNorm(s, d)),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${sqlNorm("text")} AS norm FROM documents),
      o AS (SELECT doc_id AS o_id, substr(norm, 1, 24) AS t FROM norm),
      p AS (SELECT doc_id AS p_id, substr(t, 1, 7) || substr(t, 9) AS tc
            FROM (SELECT doc_id, substr(norm, 1, 24) AS t FROM norm)
            WHERE doc_id % 5 = 0),
      ok AS (
        SELECT o_id, t, t AS k FROM o
        UNION
        SELECT o_id, t, substr(t, 1, i-1) || substr(t, i+1) AS k
        FROM o CROSS JOIN (SELECT CAST(unnest(range(1, 25)) AS INT) AS i) r
        WHERE i <= length(t)),
      pk AS (
        SELECT p_id, tc, tc AS k FROM p
        UNION
        SELECT p_id, tc, substr(tc, 1, i-1) || substr(tc, i+1) AS k
        FROM p CROSS JOIN (SELECT CAST(unnest(range(1, 25)) AS INT) AS i) r
        WHERE i <= length(tc)),
      cand AS (
        SELECT DISTINCT o_id, p_id, t, tc
        FROM ok JOIN pk ON ok.k = pk.k)
      SELECT o_id, p_id, CAST(levenshtein(t, tc) AS INT) AS dist
      FROM cand WHERE levenshtein(t, tc) <= 1
    """),
  )

  val all: Seq[Q] = Seq(
    q30DedupExact, q31DedupMinhash, q32Simhash, q33NgramJaccard,
    q34DedupClusters, q35LangId, q36TextQuality, q37TokenCount,
    q38Fingerprint, q39Chunker, q95DedupApply, q97SimhashPairs,
    q116DedupIncremental, q126NgramContainment, q133SegmentDedup,
    q140LangMix, q143CdcChunking, q152FuzzyJoin,
  )
}
