package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming forms of the document-pipeline operators (extension beyond
  * reference parity, like [[EventStreams]]): the ops a training-data
  * ingest job runs continuously as new documents arrive. Batch plans
  * (Pipeline q30/q37) are the semantic oracles; DocStreamsSpec feeds the
  * same rows through MemoryStream and asserts convergence.
  */
object DocStreams {

  /** Streaming exact dedup — the continuous form of q30: the FIRST
    * arrival of each normalized-content hash passes, later copies are
    * dropped. `dropDuplicatesWithinWatermark` keys state on the 32-hex
    * hash and purges entries once the watermark passes their event time +
    * delay, so state is bounded by the distinct-hash arrival rate within
    * the horizon, not the stream's lifetime — the property that lets the
    * job run forever at ingest scale. (Exact global dedup with unbounded
    * lookback is a batch join against the corpus store, not stream state.)
    *
    * Input: (doc_id, text, ets TIMESTAMP event time).
    */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(graft.operators.Pipeline.normText(col("text"))))
      .withWatermark("ets", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("content_hash"), col("ets"))

  /** One (band, signature) posting of one streaming document. */
  final case class BandHit(band: Int, v: String, doc_id: Long, tms: Long,
      ets: java.sql.Timestamp)

  /** A near-dup candidate pair (i < j), possibly repeated across buckets. */
  final case class CandPair(i: Long, j: Long)

  /** Streaming near-dup CANDIDATE detection — the continuous form of
    * q31/q116's LSH banding: each arriving document computes its MinHash4
    * band signatures MAP-SIDE (the same native expression as batch),
    * state keys on the (band, signature) bucket, and an arrival emits a
    * candidate pair against every document already resident in its
    * bucket. State per bucket is the (doc_id, event-ms) list within the
    * horizon: entries age out both lazily (pruned against the current
    * watermark on each visit) and via event-time timeout when a bucket goes
    * quiet — total state is bounded by the arrival rate × horizon, never
    * the stream's lifetime, the same contract as [[dedupStream]].
    * Output pairs can repeat when two docs share several buckets; chain
    * `dropDuplicatesWithinWatermark` (or the downstream batch refine,
    * which is where exact Jaccard runs against the shingle store — LSH
    * candidates are the streaming half of the q116 incremental design).
    * DocStreamsSpec proves the emitted candidate set equals batch
    * [[graft.operators.Pipeline.bandCandidates]] on the same rows.
    */
  def nearDupCandidates(docs: DataFrame, horizonMs: Long = 3600000L)
      : org.apache.spark.sql.Dataset[CandPair] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val session = docs.sparkSession
    import session.implicits._
    docs
      .select(col("doc_id"), col("ets"),
        posexplode(graft.functions.MinHash4(
          split(graft.operators.Pipeline.normText(col("text")), " "))))
      .select(col("pos").as("band"), col("col").as("v"), col("doc_id"),
        unix_millis(col("ets")).as("tms"), col("ets"))
      .withWatermark("ets", s"$horizonMs milliseconds")
      .as[BandHit]
      .groupByKey(b => (b.band, b.v))
      .flatMapGroupsWithState[List[(Long, Long)], CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var cur = state.getOption.getOrElse(Nil)
              .filter(_._2 >= wm - horizonMs)
            val out = Seq.newBuilder[CandPair]
            rows.toSeq.sortBy(r => (r.tms, r.doc_id)).foreach { r =>
              cur.foreach { case (id, _) =>
                if (id != r.doc_id)
                  out += CandPair(math.min(id, r.doc_id), math.max(id, r.doc_id))
              }
              cur = (r.doc_id, r.tms) :: cur
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.map(_._2).max + horizonMs)
            out.result().iterator
          }
      }
  }

  /** Streaming per-window token throughput — the continuous form of q37's
    * token counting: tokens/bytes per tumbling minute, the monitoring
    * surface of an ingest pipeline. Map-side token stats via the native
    * TokenStats expression, then a watermarked windowed aggregate.
    */
  def tokenThroughput(docs: DataFrame, window_ : String = "1 minute"): DataFrame =
    docs
      .withColumn("n_tokens",
        graft.functions.TokenStats(
          graft.operators.Pipeline.normText(col("text")))
          .getField("re_tokens").cast("long"))
      .withWatermark("ets", "2 minutes")
      .groupBy(window(col("ets"), window_).as("w"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(length(col("text"))).as("total_chars"))
      .select(col("w.start").as("minute"), col("n_docs"),
        col("total_tokens"), col("total_chars"))
}
