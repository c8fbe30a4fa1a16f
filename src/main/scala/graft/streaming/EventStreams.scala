package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the events analytics (extension beyond
  * reference parity — SURVEY §2.M records the reference has no streaming).
  * The batch plans (operators/Events q26/q27) are the semantic oracles;
  * EventStreamsSpec feeds identical rows through MemoryStream and asserts
  * the streaming results converge to the batch answers.
  */
object EventStreams {

  /** Tumbling 1-hour windows by event type, with a 2-hour watermark for
    * late data — the streaming form of q26. At scale: state is one row per
    * (window, type); the watermark bounds state growth, and partial
    * aggregation happens before the shuffle exactly as in batch.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // value carries exactly 2 decimals → sum it as DECIMAL so the total
      // is order-independent: a double sum near a 4th-decimal rounding
      // boundary can flip between runs/engines and flake the parity gate
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(graft.core.Num.Money)).cast("double"), 4)
          .as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  final case class Ev(user_id: Long, event_id: Long, tms: Long)
  final case class SessionState(sessions: Long, events: Long, maxDur: Long,
      curStart: Long, curLast: Long, curEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long,
      n_events: Long, max_session_ms: Long)

  /** Stateful sessionization with a 30-minute inactivity gap — the
    * streaming form of q27 via mapGroupsWithState. State per user is O(1)
    * (running session counters, current-session bounds), so it scales to
    * arbitrary user counts; a production job adds an event-time timeout to
    * emit and purge idle users.
    */
  def sessionize(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val sorted = rows.toSeq.sortBy(e => (e.tms, e.event_id))
        var st = state.getOption.getOrElse(SessionState(0, 0, 0, -1, -1, 0))
        sorted.foreach { e =>
          st =
            if (st.curStart < 0)
              st.copy(sessions = st.sessions + 1, events = st.events + 1,
                curStart = e.tms, curLast = e.tms, curEvents = 1)
            else if (e.tms < st.curStart - 1800000L)
              // cross-batch late event more than a gap BEFORE the open
              // session: batch order would give it its own earlier
              // session; count it as one (merging several such lates
              // together would need an out-of-order buffer — the same
              // bounded approximation sessionizeClosed's "gap" emission
              // makes)
              st.copy(sessions = st.sessions + 1, events = st.events + 1)
            else if (e.tms <= st.curLast)
              // cross-batch late event inside (or within gap before) the
              // open session: merge, moving the bounds MONOTONICALLY —
              // start may extend down, last must never move backwards
              // (a dragged-back curLast made the next in-order event open
              // a spurious session and under-measured the duration)
              st.copy(events = st.events + 1,
                curStart = math.min(st.curStart, e.tms),
                curEvents = st.curEvents + 1)
            else if (e.tms - st.curLast > 1800000L) {
              val dur = st.curLast - st.curStart
              st.copy(
                sessions = st.sessions + 1, events = st.events + 1,
                maxDur = math.max(st.maxDur, dur),
                curStart = e.tms, curLast = e.tms, curEvents = 1)
            } else
              st.copy(events = st.events + 1, curLast = e.tms,
                curEvents = st.curEvents + 1)
        }
        state.update(st)
        val openDur = if (st.curStart >= 0) st.curLast - st.curStart else 0L
        UserSessions(uid, st.sessions, st.events, math.max(st.maxDur, openDur))
      }
  }

  final case class EvT(user_id: Long, event_id: Long, tms: Long,
      ets: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, events: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, closed_by: String)

  /** Production-hardened sessionization: event-time watermark + timeout, so
    * idle-user state is EMITTED AND PURGED instead of accumulating forever
    * (the scale gap [[sessionize]]'s doc admits). Append-mode semantics:
    * a session closes either when a later event arrives past the gap
    * ("gap") or when the watermark passes last_event + gap ("timeout" —
    * the state for that user is removed, bounding total state by the
    * ACTIVE user count, not the ever-seen user count).
    */
  def sessionizeClosed(events: Dataset[Ev],
      gapMs: Long = 1800000L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("ets", timestamp_millis(col("tms")))
      .withWatermark("ets", "30 minutes")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(ClosedSession(uid, st.start, st.last, st.events, "timeout"))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.tms, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              st =
                if (st == null) OpenSession(e.tms, e.tms, 1)
                else if (e.tms <= st.last)
                  // Late-but-above-watermark arrival from a later micro-batch.
                  if (st.start - e.tms > gapMs) {
                    // more than a gap BEFORE the open session: it can't merge
                    // with it (batch semantics would close it by gap) — emit
                    // it as its own session, leave the open one untouched.
                    // KNOWN approximation: two such lates that batch order
                    // would join into one earlier session each emit as a
                    // singleton — merging lates with EACH OTHER needs an
                    // out-of-order buffer, which watermark semantics push
                    // to the source
                    closed += ClosedSession(uid, e.tms, e.tms, 1, "gap")
                    st
                  } else
                    // inside (or within gap of) the open session: extend the
                    // bounds monotonically — moving `last` backwards would
                    // corrupt end_ms, fire the event-time timeout early, and
                    // could falsely close the session "by gap" on the next
                    // in-order event.
                    OpenSession(math.min(st.start, e.tms), st.last, st.events + 1)
                else if (e.tms - st.last > gapMs) {
                  closed += ClosedSession(uid, st.start, st.last, st.events, "gap")
                  OpenSession(e.tms, e.tms, 1)
                } else OpenSession(st.start, e.tms, st.events + 1)
            }
            if (st != null) {
              state.update(st)
              // timeout must sit strictly above the current watermark
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Stream–static enrichment: a streaming event frame joined to a static
    * (batch) dimension on the user key — the streaming half of the star
    * join. Spark re-plans the static side per micro-batch, so dimension
    * updates between batches are picked up; the join itself needs no
    * state/watermark (static side is bounded), and at scale the dimension
    * is broadcast or bucket-joined exactly as in batch. Left join keeps
    * events whose user has no dimension row (fk skew/late dims) with null
    * attributes rather than dropping them.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream–stream funnel join — the streaming form of q29: purchases
    * joined to the views they follow within one hour, both sides live
    * streams. This is the one Structured Streaming join shape with
    * nontrivial state semantics: BOTH sides carry an event-time watermark
    * and the join predicate bounds p_ts to [v_ts, v_ts + 1h), so Spark
    * can prove when a buffered view can never match a future purchase and
    * evict it — state stays proportional to one watermark-window of
    * traffic, never the stream's history. Without the time bound (or the
    * watermarks) the state store grows unboundedly: the 100 TB/day
    * version of this join lives or dies on exactly this eviction proof.
    */
  def streamFunnel(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("event_id"),
        col("ts").as("p_ts"))
    v.join(p,
      col("user_id") === col("p_user")
        && col("p_ts") > col("v_ts")
        && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("event_id"), col("v_ts"), col("p_ts"))
  }

  /** Run a streaming frame to completion against an in-memory sink and
    * return the final table (test/demo harness).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
