package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print one catalog query's formatted plan (post-AQE after an execution)
  * — scratch diagnostics; not part of the driver contract.
  *
  * Usage: runMain graft.tools.ExplainOne <sfDir> <name>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // drive THIS DataFrame's QueryExecution (a write would clone it and
    // the printed plan would stay isFinalPlan=false, i.e. pre-AQE)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
