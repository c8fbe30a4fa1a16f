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

  /** Run `build(stream)` to completion against a one-file parquet stream
    * and return the memory-sink table. The sink table name is unique per
    * invocation so warm-up and repeat runs never collide.
    */
  private def runToTable(s: SparkSession, dir: String, file: String,
      schema: StructType, build: DataFrame => DataFrame,
      mode: String = "complete"): DataFrame = {
    // the file stream source wants a DIRECTORY; pathGlobFilter narrows it
    // to the one fixture table
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", file).parquet(dir)
    val qname = "sp_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = build(src).writeStream
      .format("memory").queryName(qname).outputMode(mode).start()
    try query.processAllAvailable()
    finally query.stop()
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
             round(SUM(value), 4) AS total_value
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

  val all: Seq[Q] =
    Seq(q166StreamDedupParity, q167StreamHourlyParity, q168StreamSessionParity)
}
