package graft.operators

import graft.core.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (the reference has no streaming —
  * SURVEY §2.M — so these extend the engine for the `events` table; the
  * Structured Streaming variants live in graft.streaming).
  *
  * All timestamp arithmetic is done in integer epoch-milliseconds
  * (`unix_millis` / DuckDB `epoch_ms`) so both engines compute exact,
  * hash-identical results.
  */
object Events {

  /** Tumbling hourly window aggregation by event type — the batch-equivalent
    * of `groupBy(window($"ts", "1 hour"), $"event_type")`.
    */
  val q26EventsHourly = Q(
    "q26_events_hourly",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 4).as("total_value")),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type,
             count(*) AS n,
             round(SUM(value), 4) AS total_value
      FROM events GROUP BY 1, 2
    """),
  )

  /** Sessionization with a 30-minute inactivity gap — lag + cumulative-sum
    * session ids, the classic distributed formulation (partitioned by user,
    * so it scales horizontally; no driver-side loop).
    */
  val q27Sessionize = Q(
    "q27_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
      val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
        .withColumn(
          "new_s",
          when(col("tms") - lag(col("tms"), 1).over(byUser) > 1800000L
            || lag(col("tms"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(runSum))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"), (max("tms") - min("tms")).as("dur_ms"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("dur_ms")).as("max_session_ms"))
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
        FROM s GROUP BY 1, 2)
      SELECT user_id,
             count(*) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             max(dur_ms) AS max_session_ms
      FROM agg GROUP BY 1
    """),
  )

  /** Semi-structured extraction from the JSON-ish `props` column via regexp
    * (portable across both engines without a JSON extension).
    */
  val q28EventsJson = Q(
    "q28_events_json",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_type"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n")),
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS BIGINT) AS k_sum,
             count(*) AS n
      FROM events GROUP BY event_type
    """),
  )

  /** Funnel step detection: for each user, purchases that follow a view
    * within 1 hour. Joining on user_id alone materializes O(views ×
    * purchases) candidates per hot user — quadratic on exactly the power
    * users a scale-up adds — so the join key is (user_id, hour_bucket),
    * q105-style bucket expansion: a view lands in exactly one hour bucket
    * and each purchase probes the two buckets its 1-hour lookback can
    * touch (the window equals the bucket width, so two probes are
    * pigeonhole-complete and a pair can match in only one bucket — no
    * dedup needed). The exact time predicate remains as refinement;
    * candidates per user scale with events-per-hour, not events².
    */
  val q29EventFunnel = Q(
    "q29_event_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("tms").as("view_t"),
          expr("tms DIV 3600000").as("hb"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("tms").as("buy_t"),
          explode(array(expr("tms DIV 3600000 - 1"), expr("tms DIV 3600000")))
            .as("hb"))
      buys.join(views, Seq("user_id", "hb"))
        .filter(col("view_t") < col("buy_t")
          && col("buy_t") - col("view_t") <= 3600000L)
        .groupBy("user_id")
        .agg(
          countDistinct(col("event_id")).as("n_converted"),
          (min(col("buy_t") - col("view_t")) / 1000).cast("long").as("fastest_s"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      v AS (SELECT user_id, tms AS view_t FROM e WHERE event_type = 'view'),
      b AS (SELECT user_id, event_id, tms AS buy_t FROM e WHERE event_type = 'purchase')
      SELECT b.user_id,
             count(DISTINCT b.event_id) AS n_converted,
             CAST(min(b.buy_t - v.view_t) // 1000 AS BIGINT) AS fastest_s
      FROM b JOIN v ON b.user_id = v.user_id
      WHERE v.view_t < b.buy_t AND b.buy_t - v.view_t <= 3600000
      GROUP BY b.user_id
    """),
  )

  /** Sessionization via Spark's native session_window operator (the
    * declarative form of q27's lag+cumsum): sessions merge while events
    * arrive within the 30-minute gap; window end = last event + gap.
    * The oracle recomputes the same sessions with the cumsum formulation.
    */
  val q47SessionWindows = Q(
    "q47_session_windows",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          col("w.start").as("s_start"),
          col("w.end").as("s_end"),
          col("n_events")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      g AS (
        SELECT user_id, t, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      s AS (
        SELECT user_id, t,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g)
      SELECT user_id,
             min(t) AS s_start,
             max(t) + INTERVAL 30 MINUTE AS s_end,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
    """),
  )

  val all: Seq[Q] =
    Seq(q26EventsHourly, q27Sessionize, q28EventsJson, q29EventFunnel,
      q47SessionWindows)
}
