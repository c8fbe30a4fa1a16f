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
