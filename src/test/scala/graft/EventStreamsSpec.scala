package graft

import graft.core.Tables
import graft.operators.Events
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Batch–streaming parity: the streaming operators fed the same rows must
  * converge to the batch plans' answers (q26/q27 are the oracles).
  */
class EventStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly window agg == batch q26 on the same events") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows.toSeq)
    val streamed = EventStreams.runToMemory(
      EventStreams.hourlyCounts(
        stream.toDF().toDF("ts", "event_type", "value")),
      "hourly_test", OutputMode.Complete())
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = Events.q26EventsHourly.plan(spark, dir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
  }

  test("sessionizeClosed: idle users time out, emit, and purge; gaps close inline") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val H = 3600000L
    // base offset: event times at epoch 0 collide with the INITIAL watermark
    // (also 0) and are dropped as late — any real feed starts above it
    val B = 86400000L
    val stream = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionizeClosed(stream.toDS())
      .writeStream.format("memory").queryName("closed_test")
      .outputMode(OutputMode.Append()).start()
    def closed() = spark.table("closed_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

    // trigger 1: user 1 has 2 events; user 2 has 1
    stream.addData(Seq(
      EventStreams.Ev(1, 10, B), EventStreams.Ev(1, 11, B + 600000L),
      EventStreams.Ev(2, 20, B)))
    q.processAllAvailable()
    assert(closed().isEmpty) // all sessions still open

    // trigger 2: user 2 reappears 3h later → its first session closes by gap
    stream.addData(Seq(EventStreams.Ev(2, 21, B + 3 * H)))
    q.processAllAvailable()
    assert(closed().contains((2L, B, B, 1L, "gap")))

    // trigger 3: watermark advances past user 1's last+gap → timeout fires,
    // state purged, session emitted with its true bounds
    stream.addData(Seq(EventStreams.Ev(2, 22, B + 3 * H + 60000L)))
    q.processAllAvailable()
    assert(closed().contains((1L, B, B + 600000L, 2L, "timeout")))

    // trigger 4+5: user 1 returns → a FRESH session (proves the purge: a
    // merged state would drag start_ms back to B)
    stream.addData(Seq(EventStreams.Ev(1, 12, B + 3 * H + 120000L)))
    q.processAllAvailable()
    stream.addData(Seq(EventStreams.Ev(2, 23, B + 6 * H)))
    q.processAllAvailable()
    assert(closed().contains(
      (1L, B + 3 * H + 120000L, B + 3 * H + 120000L, 1L, "timeout")))
    q.stop()
  }

  test("sessionizeClosed: late in-session event never moves `last` backwards") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val B = 86400000L
    val gap = 1800000L
    val stream = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionizeClosed(stream.toDS())
      .writeStream.format("memory").queryName("ooo_test")
      .outputMode(OutputMode.Append()).start()
    def closed() = spark.table("ooo_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

    // trigger 1: open session [B, B+600k] (watermark trails by 30min, so a
    // later event at B+300k is late-but-not-filtered)
    stream.addData(Seq(
      EventStreams.Ev(1, 10, B), EventStreams.Ev(1, 11, B + 600000L)))
    q.processAllAvailable()
    // trigger 2: out-of-order arrival INSIDE the open session
    stream.addData(Seq(EventStreams.Ev(1, 12, B + 300000L)))
    q.processAllAvailable()
    // trigger 3: B+2200000 is within gap of the true last (B+600000) but
    // beyond gap of the stale last a regression would have kept (B+300000)
    // — the session must continue, not close "by gap"
    stream.addData(Seq(EventStreams.Ev(1, 13, B + 2200000L)))
    q.processAllAvailable()
    assert(closed().isEmpty)

    // advance the watermark far past last+gap via another user → timeout
    // emits the ONE session with all 4 events and the true end
    stream.addData(Seq(EventStreams.Ev(9, 90, B + 2200000L + 2 * gap + 120000L)))
    q.processAllAvailable()
    stream.addData(Seq(EventStreams.Ev(9, 91, B + 2200000L + 3 * gap)))
    q.processAllAvailable()
    assert(closed().contains((1L, B, B + 2200000L, 4L, "timeout")))
    assert(!closed().exists { case (uid, _, _, _, why) => uid == 1L && why == "gap" })
    q.stop()
  }

  test("sessionizeClosed: a late event more than a gap before the session start closes alone") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val B = 86400000L
    val stream = MemoryStream[EventStreams.Ev]
    // 5-minute gap, so a late arrival can be "older than a gap before start"
    // while still above the 30-minute watermark
    val q = EventStreams.sessionizeClosed(stream.toDS(), gapMs = 300000L)
      .writeStream.format("memory").queryName("latealone_test")
      .outputMode(OutputMode.Append()).start()
    def closed() = spark.table("latealone_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

    stream.addData(Seq(EventStreams.Ev(1, 10, B)))
    q.processAllAvailable()
    // late event 10 min before the open session's start (gap is 5 min):
    // batch semantics close it alone; it must NOT merge and drag start back
    stream.addData(Seq(EventStreams.Ev(1, 11, B - 600000L)))
    q.processAllAvailable()
    assert(closed() === Set((1L, B - 600000L, B - 600000L, 1L, "gap")))

    // the open session is untouched: timeout later emits [B, B] with 1 event
    stream.addData(Seq(EventStreams.Ev(9, 90, B + 3 * 3600000L)))
    q.processAllAvailable()
    stream.addData(Seq(EventStreams.Ev(9, 91, B + 4 * 3600000L)))
    q.processAllAvailable()
    assert(closed().contains((1L, B, B, 1L, "timeout")))
    q.stop()
  }

  test("sessionize: a cross-batch late event merges without dragging bounds back") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val B = 86400000L; val M = 60000L
    val stream = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("late_sessions_test")
      .outputMode(OutputMode.Update()).start()
    // batch 1: open session [B, B+10min]
    stream.addData(Seq(
      EventStreams.Ev(1, 10, B), EventStreams.Ev(1, 11, B + 10 * M)))
    q.processAllAvailable()
    // batch 2: LATE arrival inside the open session — a dragged-back
    // curLast would make batch 3's event open a spurious session and
    // under-measure the duration
    stream.addData(Seq(EventStreams.Ev(1, 12, B + 5 * M)))
    q.processAllAvailable()
    // batch 3: 35 min after the TRUE last → closes [B, B+10min] by gap
    stream.addData(Seq(EventStreams.Ev(1, 13, B + 45 * M)))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("late_sessions_test")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"),
        col("max_session_ms"))).as("s"))
      .select(col("s.n_sessions"), col("s.n_events"), col("s.max_session_ms"))
      .head()
    // batch semantics on sorted [0, 5, 10, 45] min: one 3-event 10-minute
    // session, then the 45-minute event opens a second
    assert((fin.getLong(0), fin.getLong(1), fin.getLong(2)) ==
      ((2L, 4L, 10 * M)))
  }

  test("stateful sessionization across triggers == batch q27 (split feed)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
      .collect()
      .map(r => EventStreams.Ev(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.tms)
    // feed in two chronological triggers to exercise state carry-over
    val (first, second) = evs.splitAt(evs.length / 2)
    val stream = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Update()).start()
    stream.addData(first.toSeq); q.processAllAvailable()
    stream.addData(second.toSeq); q.processAllAvailable()
    q.stop()
    // latest update per user wins; n_events strictly grows per update, so
    // the struct max picks the final state deterministically
    val streamed = spark.table("sessions_test")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"), col("max_session_ms"))).as("s"))
      .select(col("user_id"), col("s.n_sessions"), col("s.n_events"),
        col("s.max_session_ms"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = Events.q27Sessionize.plan(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed === batch)
  }

  test("stream-stream funnel join == the exhaustive time-bounded pair set") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .collect()
    val views = ev.filter(_.getString(2) == "view")
      .map(r => (r.getLong(0), r.getTimestamp(3)))
    val buys = ev.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3)))
    val vs = MemoryStream[(Long, Timestamp)]
    vs.addData(views.toSeq)
    val ps = MemoryStream[(Long, Long, Timestamp)]
    ps.addData(buys.toSeq)
    val out = EventStreams.runToMemory(
      EventStreams.streamFunnel(
        vs.toDF().toDF("user_id", "ts"),
        ps.toDF().toDF("user_id", "event_id", "ts")),
      "funnel_test", OutputMode.Append())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      .toSet
    val batch = (for {
      (vu, vt) <- views
      (bu, be, bt) <- buys
      if vu == bu && bt.getTime > vt.getTime &&
        bt.getTime <= vt.getTime + 3600000L
    } yield (vu, be, vt, bt)).toSet
    assert(out.nonEmpty)
    assert(out === batch)
  }

  test("stream-static enrich == batch left join; dim-less users survive with nulls") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    // static dim derived from the same corpus, deliberately missing ~half
    // the users (odd ids) to exercise the left-join null path
    val dim = events.select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("tier", when(col("user_id") % 4 === 0, "gold").otherwise("std"))
    val rows = events.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val stream = MemoryStream[(Long, Long, String)]
    stream.addData(rows.toSeq)
    val streamed = EventStreams.runToMemory(
      EventStreams.enrich(
        stream.toDF().toDF("event_id", "user_id", "event_type"), dim, "user_id"),
      "enrich_test", OutputMode.Append())
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getString(2), Option(r.getString(3))))
      .toSet
    val batch = EventStreams.enrich(events, dim, "user_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getString(2), Option(r.getString(3))))
      .toSet
    assert(streamed === batch)
    assert(batch.exists(_._4.isEmpty) && batch.exists(_._4.nonEmpty))
  }
}
