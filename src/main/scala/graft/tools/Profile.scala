package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Wall-clock profiler for catalog queries: times each named query's
  * noop-write (Bench methodology: one warm pass at sf0.001, then N timed
  * passes) so plan changes can be compared without a full bench run.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <q1,q2,...> [passes]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sort-based shuffle writer at any width — see Bench.scala's note
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // same session shape as Bench (no speculation — it is a no-op under
      // local[N]; ADVICE r8) so Profile and Bench numbers stay comparable
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_CONF="k1=v1;k2=v2" overlays arbitrary
    // session configs so config hypotheses can be measured without edits
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_CONF entry '$kv' is not k=v (full var must be k1=v1;k2=v2)")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // Scheduler-overhead counters (guide §1.1: decide whether time goes to
    // compute or orchestration): jobs/stages/tasks launched and the summed
    // executor task time, reset per measured pass. At sf0.1 most catalog
    // queries are launch-floor-bound, so (wall − Στask/cores) ≈ the fixed
    // cost that job count × task count drives.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    // shuffle volume (round 15): bytes an exchange actually moved — the
    // direct evidence when a change claims to remove/shrink a shuffle
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    // per-job wall clock of the LAST pass: (start, end) per job id — shows
    // whether a query's wall is one heavy job or many ~150 ms stage-jobs
    val jobWall = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobWall.put(j.jobId, (j.time, 0L))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobWall.get(j.jobId)
        if (st != null) jobWall.put(j.jobId, (st._1, j.time))
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          shufRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })
    def resetCounters(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      shufRead.set(0); shufWrite.set(0); jobWall.clear()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // NonFatal only: a typo'd query name or missing fixture should fail
      // loudly, not silently profile cold; OOM/fatal errors must propagate
      try fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"warm-up failed for $n: ${e.getMessage}")
      }
      val times = (1 to passes).map { _ =>
        // Bench.exec hygiene: GC outside the timed region + drop only this
        // pass's localCheckpoint blocks, so Profile's numbers are taken
        // under the same heap/storage conditions as the graded bench
        System.gc()
        val preExisting = spark.sparkContext.getPersistentRDDs.keySet
        resetCounters()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!preExisting.contains(id)) rdd.unpersist(false)
        }
        t
      }
      // counters reflect the LAST pass (the warmest — overhead shows purest);
      // the listener bus is async — give it a beat to drain before reading
      Thread.sleep(300)
      println(f"$n%-30s min ${times.min}%6.2f s  runs ${times.map(t => f"$t%.2f").mkString(" ")}" +
        f"  [last pass: ${jobs.get}%d jobs ${stages.get}%d stages ${tasks.get}%d tasks ${taskMs.get / 1000.0}%.2f task-s" +
        f" shuf ${shufWrite.get / 1024}%dKB/w ${shufRead.get / 1024}%dKB/r]")
      if (sys.env.contains("SPARK_GRAFT_JOBWALL")) {
        import scala.jdk.CollectionConverters._
        val js = jobWall.asScala.toSeq.sortBy(_._2._1)
        // wall per job plus the GAP since the previous job ended (driver-only
        // time: planning, AQE re-optimization, collect processing)
        val lines = js.zip((0L, 0L) +: js.map(_._2)).map {
          case ((id, (st, en)), (_, prevEnd)) =>
            val gap = if (prevEnd == 0) 0 else st - prevEnd
            s"j$id ${en - st}ms gap ${gap}ms"
        }
        println("    " + lines.mkString(" | "))
      }
    }
    spark.stop()
  }
}
