package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Streaming-throughput micro-bench (VERDICT r11 #7): the StreamParity
  * queries are correctness-gated but excluded from Bench by design (a
  * per-run timing would measure harness start/stop, not operator
  * throughput), so the streaming extension needs its own perf record.
  *
  * Protocol: the q167 hourly pipeline (file source → watermark → tumbling
  * window aggregation, `EventStreams.hourlyCounts`) drains the target
  * SF's events.parquet through a NOOP sink in update mode —
  * `maxBytesPerTrigger` splits the drain into multiple micro-batches so
  * the run exercises real incremental state updates, not one batch-in-
  * disguise. One warm-up drain at sf0.001 compiles the codegen; then
  * `Passes` timed drains, each a fresh stream over the same data.
  * Reported per pass: rows, micro-batches, wall seconds (start →
  * processAllAvailable), and the state-pipeline rate rows /
  * Σ(triggerExecution ms) from Spark's own progress events (excludes
  * stream-start latency). Headline = the MEDIAN pass by wall time. The
  * record lands in bench/stream_throughput.json with a host fingerprint,
  * same stance as bench_side_by_side.json.
  */
object StreamBench {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val Passes = 3

  final case class PassResult(rows: Long, batches: Int, wallS: Double,
      trigS: Double)

  private val Chunks = 8

  /** The file stream source triggers at FILE granularity (maxBytes/
    * maxFiles cap the per-trigger file SET; a single file is always one
    * trigger), so a one-file fixture would be a batch job in disguise.
    * Stage the events into `Chunks` parquet files once, OUTSIDE the timed
    * region; each timed drain then runs `Chunks` micro-batches.
    */
  private def stage(s: SparkSession, dir: String): String = {
    val out = java.nio.file.Files.createTempDirectory("streambench").toString
    s.read.parquet(s"$dir/events.parquet")
      .repartition(Chunks).write.mode("overwrite").parquet(out)
    out
  }

  private def drain(s: SparkSession, stagedDir: String,
      filesPerTrigger: Int = 1): PassResult = {
    val src = s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(stagedDir)
    val q = graft.streaming.EventStreams.hourlyCounts(src)
      .writeStream.format("noop").outputMode("update").start()
    val t0 = System.nanoTime()
    try q.processAllAvailable()
    finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    val rows = prog.map(_.numInputRows).sum
    val trigMs = prog.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue)).sum
    PassResult(rows, prog.length, wall, trigMs / 1e3)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sort-based shuffle writer at any width — see Bench.scala's note
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    drain(spark, stage(spark, "/root/testdata/sf0.001")) // codegen warm-up
    val staged = stage(spark, sfDir)
    val passes = (1 to Passes).map(_ => drain(spark, staged))
    val med = passes.sortBy(_.wallS)(Ordering.Double.TotalOrdering)(Passes / 2)
    // SECOND drain config (round 15): maxFilesPerTrigger=4 amortizes the
    // per-trigger planning + state-store round trip over 4x the rows per
    // micro-batch (Chunks/4 = 2 triggers per drain). Reported as its own
    // point; the per-file drain above stays the primary record (it is the
    // one that exercises incremental state 8 times).
    val BatchedFpt = 4
    val passes4 = (1 to Passes).map(_ => drain(spark, staged, BatchedFpt))
    val med4 = passes4.sortBy(_.wallS)(Ordering.Double.TotalOrdering)(Passes / 2)

    // BATCH COMPARATOR (VERDICT r13 #5: "141k rows/s" graded nothing
    // without a same-work baseline): the SAME hourlyCounts transform over
    // the SAME staged files as one batch job — EliminateEventTimeWatermark
    // drops the watermark node on a non-streaming child, so the logical
    // work differs only by micro-batched state vs one-shot aggregation.
    // The gap between the two rates IS the price of incremental state
    // (8 micro-batches, state store updates, per-trigger planning).
    def batchPass(): (Long, Double) = {
      val df = spark.read.schema(eventSchema).parquet(staged)
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.hourlyCounts(df)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      (df.count(), wall)
    }
    batchPass() // warm-up, symmetric with the stream side
    val batchPasses = (1 to Passes).map(_ => batchPass())
    val bmed = batchPasses.sortBy(_._2)(Ordering.Double.TotalOrdering)(Passes / 2)

    def r1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    // trigS sums triggerExecution durations, which can be 0 (key absent
    // from a batch's durationMs, or all batches sub-millisecond) — a bare
    // division would print Infinity/NaN and make the JSON artifact
    // unparseable (ADVICE r12). Emit JSON null instead.
    def rps(rows: Long, s: Double): String =
      if (s > 0) r1(rows / s) else "null"
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val cpuModel =
      try scala.io.Source.fromFile("/proc/cpuinfo").getLines()
        .collectFirst { case l if l.startsWith("model name") =>
          l.split(":").last.trim }
        .getOrElse("unknown")
      catch { case _: Throwable => "unknown" }
    def passesJson(ps: Seq[PassResult]): String = ps.map(p =>
      s"""{"rows":${p.rows},"batches":${p.batches},"wall_s":${r3(p.wallS)},""" +
        s""""trig_s":${r3(p.trigS)},"rows_per_s_wall":${r1(p.rows / p.wallS)},""" +
        s""""rows_per_s_trig":${rps(p.rows, p.trigS)}}""").mkString("[", ",", "]")
    val passJson = passesJson(passes)
    val batchJson = batchPasses.map { case (rows, w) =>
      s"""{"rows":$rows,"wall_s":${r3(w)},"rows_per_s":${r1(rows / w)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"stream_rows_per_s","value":${r1(med.rows / med.wallS)},""" +
        s""""pipeline":"q167_hourly (file source -> watermark -> 1h window agg -> noop)",""" +
        s""""protocol":"events staged into $Chunks parquet files (untimed), drained at maxFilesPerTrigger=1 -> $Chunks micro-batches of incremental state updates; 1 warm-up at sf0.001; median of $Passes passes by wall; rows_per_s_trig excludes stream-start latency; batch = the SAME hourlyCounts transform over the SAME staged files as one batch job (watermark eliminated on batch children), same warm-up and median protocol",""" +
        s""""rows":${med.rows},"batches":${med.batches},"wall_s":${r3(med.wallS)},""" +
        s""""rows_per_s_trig":${rps(med.rows, med.trigS)},"passes":$passJson,""" +
        s""""batched_drain":{"max_files_per_trigger":$BatchedFpt,""" +
        s""""rows_per_s_wall":${r1(med4.rows / med4.wallS)},""" +
        s""""rows":${med4.rows},"batches":${med4.batches},""" +
        s""""wall_s":${r3(med4.wallS)},""" +
        s""""rows_per_s_trig":${rps(med4.rows, med4.trigS)},""" +
        s""""passes":${passesJson(passes4)}},""" +
        s""""batch_rows_per_s":${r1(bmed._1 / bmed._2)},""" +
        s""""batch_wall_s":${r3(bmed._2)},""" +
        s""""stream_vs_batch":${r3((bmed._1 / bmed._2) / (med.rows / med.wallS))},""" +
        s""""batch_passes":$batchJson,""" +
        s""""sf":"$sfDir","host":{"cpu":"${cpuModel.replace("\"", "")}",""" +
        s""""cores":${Runtime.getRuntime.availableProcessors()}}}"""
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("/root/repo/bench"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/root/repo/bench/stream_throughput.json"),
        json.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    try org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
