package graft.streaming

import graft.core.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming↔batch parity as CORRECTNESS-gate queries (VERDICT r7 next-5):
  * the streaming surface (EventStreams/DocStreams) was proven only by
  * ScalaTest batch-parity; these catalog entries run a real Structured
  * Streaming job over the same parquet fixtures — file source → stateful
  * aggregation → memory sink, one `processAllAvailable()` — and return a
  * result whose DuckDB oracle is the BATCH semantics. A green row here
  * means the streaming path computes byte-identical answers to the batch
  * plan on the same data.
  *
  * Scale notes: the memory sink is the materialization edge of the parity
  * HARNESS (the gate's equivalent of the API-edge collect) — a production
  * job writes parquet/Kafka. The streaming aggregations themselves carry
  * the scale contract: state is one row per group key, partial aggregation
  * runs before the shuffle exactly as in batch, and the q166 result is
  * re-aggregated to a copies-histogram so the compared frame stays tiny
  * while `sum(keep_id)` still pins the exact per-hash keeper choice.
  *
  * These run in the correctness gate but are excluded from Bench: a
  * per-run measurement would time streaming-harness startup (query
  * start/stop, sink materialization), not operator throughput — the
  * streaming operators' throughput contract lives in
  * EventStreamsSpec/DocStreamsSpec.
  */
object StreamParity {

  /** A memory-sink table holds its rows in driver memory, and the lazy
    * result frame reads it AFTER the building call returns — so the
    * CURRENT invocation's sink table (and, for q169, its temp fixture
    * dir) cannot be dropped inline. Instead every new invocation sweeps
    * the artifacts of all PREVIOUS ones (stale by then: each gate/warm-up
    * run materializes its result before the next starts), so repeat runs
    * in one JVM don't accumulate driver-heap tables and /tmp fixture
    * copies without bound.
    */
  private val priorTables =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val priorDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def sweepPrior(s: SparkSession): Unit = {
    var t = priorTables.poll()
    while (t != null) { s.catalog.dropTempView(t); t = priorTables.poll() }
    var d = priorDirs.poll()
    while (d != null) {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      d = priorDirs.poll()
    }
  }

  /** Run `build(stream)` to completion against a one-file parquet stream
    * and return the memory-sink table. The sink table name is unique per
    * invocation so warm-up and repeat runs never collide.
    */
  private def runToTable(s: SparkSession, dir: String, file: String,
      schema: StructType, build: DataFrame => DataFrame,
      mode: String = "complete"): DataFrame = {
    sweepPrior(s)
    // the file stream source wants a DIRECTORY; pathGlobFilter narrows it
    // to the one fixture table
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", file).parquet(dir)
    val qname = "sp_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = build(src).writeStream
      .format("memory").queryName(qname).outputMode(mode).start()
    try query.processAllAvailable()
    finally query.stop()
    priorTables.add(qname)
    s.table(qname)
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming exact-dedup parity with q30: the dedup aggregate
    * (min-doc_id keeper + copy count per normalized-content hash) runs as
    * a streaming stateful aggregation, then collapses to a per-n_copies
    * histogram whose `sum(keep_id)` equals the batch keeper set's.
    */
  val q166StreamDedupParity = Q(
    "q166_stream_dedup_parity",
    (s, d) => {
      runToTable(s, d, "documents.parquet", docSchema, docs =>
        docs.groupBy(
            md5(graft.operators.Pipeline.normText(col("text")))
              .as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_copies")))
        .groupBy("n_copies")
        .agg(count(lit(1)).as("n_hashes"), sum(col("keep_id")).as("sum_keep_ids"))
    },
    Some(s"""
      WITH k AS (
        SELECT md5(${graft.operators.Pipeline.sqlNorm("text")}) AS content_hash,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1)
      SELECT n_copies, count(*) AS n_hashes,
             CAST(sum(keep_id) AS BIGINT) AS sum_keep_ids
      FROM k GROUP BY 1
    """),
  )

  /** Streaming hourly-rollup parity with q26, through the SAME operator
    * the streaming spec exercises ([[EventStreams.hourlyCounts]]:
    * watermarked tumbling window + partial-agg-before-shuffle).
    */
  val q167StreamHourlyParity = Q(
    "q167_stream_hourly_parity",
    (s, d) =>
      runToTable(s, d, "events.parquet", eventSchema, EventStreams.hourlyCounts),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type,
             count(*) AS n,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS total_value
      FROM events GROUP BY 1, 2
    """),
  )

  /** Streaming SESSIONIZATION parity with q27 — this one exercises the
    * custom-state path ([[EventStreams.sessionize]]:
    * `mapGroupsWithState`), not a built-in aggregation: per-user session
    * counters accumulate in O(1) group state, the operator is the final
    * stage of the streaming query (Spark forbids post-mapGroupsWithState
    * aggregation in update mode), and the comparison rollup — a
    * sessions-per-user histogram with exact event/duration sums — runs as
    * a BATCH aggregation over the memory sink. The DuckDB oracle computes
    * the same histogram from the batch lag+cumsum sessionization (q27's
    * oracle form), so a green row proves the stateful streaming operator
    * reproduces the distributed-window batch semantics exactly.
    */
  val q168StreamSessionParity = Q(
    "q168_stream_session_parity",
    (s, d) => {
      import s.implicits._
      runToTable(s, d, "events.parquet", eventSchema, ev =>
        EventStreams.sessionize(
          ev.select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("tms")).as[EventStreams.Ev]
        ).toDF(),
        mode = "update")
        // In update mode the memory sink APPENDS one row per user per
        // trigger, so a multi-batch read (maxFilesPerTrigger, multi-file
        // fixture) would leave intermediate state rows in the sink.
        // Reduce to each user's FINAL state first: all three counters are
        // monotone nondecreasing across a user's emissions (sessions and
        // events only grow; max_session_ms is a running max of closed and
        // open-session durations), so the per-user max of each column IS
        // the last emission — correct under any trigger slicing.
        .groupBy("user_id")
        .agg(max(col("n_sessions")).as("n_sessions"),
          max(col("n_events")).as("n_events"),
          max(col("max_session_ms")).as("max_session_ms"))
        .groupBy("n_sessions")
        .agg(count(lit(1)).as("n_users"),
          sum(col("n_events")).as("n_events"),
          sum(col("max_session_ms")).as("sum_max_ms"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms FROM events),
      g AS (
        SELECT user_id, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      s AS (
        SELECT user_id, tms,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g),
      agg AS (
        SELECT user_id, sid, count(*) AS n_events, max(tms) - min(tms) AS dur_ms
        FROM s GROUP BY 1, 2),
      u AS (
        SELECT user_id, count(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               max(dur_ms) AS max_ms
        FROM agg GROUP BY 1)
      SELECT n_sessions, count(*) AS n_users,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(max_ms) AS BIGINT) AS sum_max_ms
      FROM u GROUP BY 1
    """),
  )

  /** LATE-DATA watermark parity (VERDICT r8 #7): [[EventStreams
    * .hourlyCounts]] over TWO micro-batches, where the second delivers
    * out-of-order events — some inside the 2-hour watermark (must be
    * merged into their hour windows) and some beyond it (their windows'
    * state was evicted; the rows must be DROPPED). The split is
    * deterministic (`event_id % 10 = 3` held back for batch 2, so ~10% of
    * the fixture arrives late), and the DuckDB oracle is the batch
    * aggregation restricted to the ACCEPTED rows: all of batch 1, plus
    * batch-2 rows whose hour window ends after `max(ts in batch 1) − 2h`
    * (the watermark Spark fixes at the end of micro-batch 1). A green row
    * proves both halves of the watermark contract — bounded state via
    * eviction AND exact merge of in-watermark stragglers.
    *
    * Harness mechanics: batch 1 is written to a temp dir before the query
    * starts; `processAllAvailable()` drains it (fixing the watermark);
    * batch 2 is then APPENDED as a new file and drained. Update mode
    * emits one row per UPDATED window per trigger, so the sink is reduced
    * to each window's final emission first — `n` strictly increases
    * whenever a window re-emits, so `max_by(_, n)` picks the last one.
    */
  val q169StreamLateParity = Q(
    "q169_stream_late_parity",
    (s, d) => {
      sweepPrior(s)
      val ev = s.read.parquet(s"$d/events.parquet")
      val lateCond = col("event_id") % 10 === 3
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_late_parity_").toString
      ev.filter(!lateCond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = s.readStream.schema(eventSchema).parquet(tmp)
      val qname =
        "sp_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val query = EventStreams.hourlyCounts(src).writeStream
        .format("memory").queryName(qname).outputMode("update").start()
      try {
        query.processAllAvailable() // batch 1: watermark := max(ts) − 2h
        ev.filter(lateCond).coalesce(1).write.mode("append").parquet(tmp)
        query.processAllAvailable() // batch 2: the late deliveries
      } finally query.stop()
      priorTables.add(qname)
      priorDirs.add(tmp)
      s.table(qname)
        .groupBy("hour", "event_type")
        .agg(max(col("n")).as("n"),
          max_by(col("total_value"), col("n")).as("total_value"))
    },
    Some("""
      WITH a AS (SELECT * FROM events WHERE event_id % 10 <> 3),
      b AS (SELECT * FROM events WHERE event_id % 10 = 3),
      wm AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR AS w FROM a),
      acc AS (
        SELECT ts, event_type, value FROM a
        UNION ALL
        SELECT b.ts, b.event_type, b.value FROM b, wm
        WHERE date_trunc('hour', CAST(b.ts AS TIMESTAMP))
                + INTERVAL 1 HOUR > wm.w)
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type,
             count(*) AS n,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS total_value
      FROM acc GROUP BY 1, 2
    """),
  )

  /** Stream–static enrichment parity: [[EventStreams.enrich]] left-joins
    * the live event stream to a STATIC dimension (customers keyed by
    * user_id, carrying the nation), then a streaming aggregation rolls
    * the enriched stream up per (nation, event_type). Exercises the
    * third streaming join shape the gate was missing — stateless
    * stream–static (the dimension is re-planned per micro-batch, never
    * held as state) — including the missing-dimension path: user_ids
    * with no customer row flow through as a NULL nation group, exactly
    * as the batch LEFT JOIN's. The oracle is that batch join.
    */
  val q171StreamEnrichParity = Q(
    "q171_stream_enrich_parity",
    (s, d) => {
      val dim = graft.core.Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
      runToTable(s, d, "events.parquet", eventSchema, ev =>
        EventStreams.enrich(ev, dim, "user_id")
          .groupBy(col("c_nationkey").as("nation"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            // 2-decimal value → exact decimal sum, order-independent
            round(sum(col("value")
              .cast(graft.core.Num.Money)).cast("double"), 4)
              .as("total_value")))
    },
    Some("""
      SELECT c.c_nationkey AS nation, e.event_type,
             count(*) AS n,
             round(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS total_value
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1, 2
    """),
  )

  val all: Seq[Q] =
    Seq(q166StreamDedupParity, q167StreamHourlyParity,
      q168StreamSessionParity, q169StreamLateParity,
      q171StreamEnrichParity)
}
