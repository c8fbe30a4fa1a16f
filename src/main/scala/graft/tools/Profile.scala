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
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-30s min ${times.min}%6.2f s  runs ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
