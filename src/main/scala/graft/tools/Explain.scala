package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named catalog
  * queries (or a few representative ones) so scan pushdown, join strategy,
  * and codegen spans can be inspected per round.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [query names...]
  *
  * `SPARK_GRAFT_FINAL=1` EXECUTES each query first and prints the
  * post-AQE final plan (isFinalPlan=true) — the static explain() shows
  * pre-adaptive join strategies, which is misleading for anything AQE
  * converts at runtime. Execution drives the plan root directly and
  * counts rows on the executors; results never materialize on the
  * driver (a collect() would OOM on large-output queries at sf1+).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_pushdown", "q12_top_brands", "q13_region_revenue",
        "q01_pricing_summary", "q18_window_rownum")
    val finalPlan = sys.env.contains("SPARK_GRAFT_FINAL")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (finalPlan) {
            // toRdd goes through SQLExecution.withNewExecutionId — the
            // supported way to force the AQE final plan (a bare
            // executedPlan.execute() bypasses execution-id scoping and
            // breaks on command-result plan shapes)
            df.queryExecution.toRdd.count()
            println(df.queryExecution.executedPlan.toString.take(8000))
          } else df.explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
