package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q31 dedup pipeline — times each stage of
  * minhashPairs in isolation (index build / df cap / band candidates /
  * jaccard refine) so optimization effort lands where the time is.
  * Not part of the driver contract; safe to delete.
  */
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val P = graft.operators.Pipeline
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val norm = P.docsNorm(spark, sfDir)
      val sh0 = time("hashedShinglesOf count") {
        P.hashedShinglesOf(norm).count()
      }
      println(s"  index rows: $sh0")
      val sh = time("dfCappedShingles mat") {
        val f = P.dfCappedShingles(P.hashedShinglesOf(norm), P.DfCap)
        f.count(); f
      }
      val cand = time("bandCandidates mat") {
        val c = P.bandCandidates(norm); c.count(); c
      }
      time("jaccard refine") {
        P.jaccardOf(cand, sh, 0.015).count()
      }
      time("full minhashPairs") {
        P.minhashPairs(norm, 0.015).count()
      }
    }
    spark.stop()
  }
}
