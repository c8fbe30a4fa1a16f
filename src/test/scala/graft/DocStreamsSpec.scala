package graft

import graft.streaming.DocStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming document pipeline: dedup keeps the FIRST arrival per content
  * hash with watermark-bounded state; token throughput converges to the
  * batch aggregate on the same rows.
  */
class DocStreamsSpec extends SparkSpec {

  private val B = 86400000L // base ms: stay above the initial watermark (0)

  test("dedupStream keeps the first arrival per hash; within-horizon copies drop") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = DocStreams.dedupStream(
        stream.toDF().toDF("doc_id", "text", "ets"), "30 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    def ids() = spark.table("dedup_test").collect().map(_.getLong(0)).toSet

    // trigger 1: two distinct texts (one with whitespace/case noise dup)
    stream.addData(Seq(
      (1L, "Hello  World", new Timestamp(B)),
      (2L, "hello world", new Timestamp(B + 60000L)), // dup of 1 normalized
      (3L, "something else", new Timestamp(B + 60000L))))
    q.processAllAvailable()
    assert(ids() === Set(1L, 3L))

    // trigger 2: another copy of doc 1's content within the horizon → drops
    stream.addData(Seq((4L, "HELLO   world", new Timestamp(B + 120000L))))
    q.processAllAvailable()
    assert(ids() === Set(1L, 3L))

    // trigger 3: advance the watermark far past the horizon, then replay
    // the same content — state for the old hash was purged, so the replay
    // is accepted as a fresh first (the bounded-state contract: streaming
    // dedup is exact only within the watermark horizon)
    stream.addData(Seq((5L, "advancer", new Timestamp(B + 7200000L))))
    q.processAllAvailable()
    stream.addData(Seq((6L, "hello world", new Timestamp(B + 7150000L))))
    q.processAllAvailable()
    assert(ids() === Set(1L, 3L, 5L, 6L))
    q.stop()
  }

  test("dedupStream hash matches batch q30 exact-dedup on the same rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String, Timestamp)]
    // feed in doc_id order so "first arrival" == batch's min(doc_id) keeper
    stream.addData(docs.sortBy(_._1).zipWithIndex.map { case ((id, t), i) =>
      (id, t, new Timestamp(B + i * 1000L))
    }.toSeq)
    val q = DocStreams.dedupStream(
        stream.toDF().toDF("doc_id", "text", "ets"))
      .writeStream.format("memory").queryName("dedup_parity")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_parity").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val batch = graft.operators.Pipeline.q30DedupExact
      .plan(spark, "/root/testdata/sf0.001")
      .filter(col("keep_id").isin(docs.map(_._1): _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch q30 covers the full table; restrict both sides to the fed docs
    val fedHashes = streamed.keySet
    assert(streamed === batch.view.filterKeys(fedHashes).toMap)
    assert(streamed.values.toSet === batch.values.filter(docs.map(_._1).contains).toSet)
  }

  test("tokenThroughput converges to the batch per-minute aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (1L, "alpha beta gamma", B),
      (2L, "delta epsilon", B + 10000L),
      (3L, "zeta", B + 70000L), // next minute
    )
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(rows.map { case (id, t, ms) => (id, t, new Timestamp(ms)) })
    val q = DocStreams.tokenThroughput(
        stream.toDF().toDF("doc_id", "text", "ets"))
      .writeStream.format("memory").queryName("tok_test")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tok_test").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (B, 2L, 5L, 16L + 13L),         // 5 word tokens, chars of both texts
      (B + 60000L, 1L, 1L, 4L)))
    q.stop()
  }

  test("nearDupCandidates equals batch bandCandidates; horizon purges state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // sf0.001 documents carry real near-dups; feed a slice as a stream
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(80).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(docs.zipWithIndex.map { case ((id, t), i) =>
      (id, t, new Timestamp(B + i * 1000L))
    }.toSeq)
    val q = DocStreams.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text", "ets"))
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val streamed = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Pipeline.bandCandidates(
        graft.operators.Pipeline.normDocs(
          docs.toSeq.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must contain banded candidates")
    assert(streamed === batch)

    // advance the watermark far past the horizon, then replay one of the
    // paired docs: its bucket state was purged, so no pair re-emits
    val (pi, _) = batch.head
    val text = docs.toMap.apply(pi)
    stream.addData(Seq((9001L, "watermark advancer text",
      new Timestamp(B + 9000000L))))
    q.processAllAvailable()
    stream.addData(Seq((9002L, text, new Timestamp(B + 8990000L))))
    q.processAllAvailable()
    val after = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.exists(p => p._1 == 9002L || p._2 == 9002L),
      "state past the horizon must be purged")
    q.stop()
  }
}
