package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection: `runMain graft.Explain <query> <sfDir> [full]`.
  * Prints the executed plan (post-AQE when the query ran) — the iteration
  * tool behind the "explain, then iterate until it's the plan you'd want"
  * loop; not part of the driver contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // sort-based shuffle writer at any width — see Bench.scala's note
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    if (args.contains("full")) println(plan)
    else println(plan.linesIterator
      .filter(l => Seq("Exchange", "Window", "Aggregate", "Reused", "Join",
        "Scan", "Sort").exists(l.contains))
      .mkString("\n"))
    spark.stop()
  }
}
