package graft

import org.apache.spark.sql.SparkSession

/** Relative-cost regression guards (VERDICT r8 #6). PlanSpec pins plan
  * SHAPES; nothing pinned relative COST, so a straggler-prone shape (the
  * r8 q132 driver pathology: a Zipf-keyed raw-occurrence shuffle) could
  * land with every shape assertion green. These guards time the flagged
  * queries against a healthy same-family baseline (q104 tf-idf: same
  * table, same normalize+explode front end) at sf0.01 and fail on a
  * LARGE relative blowout. Bounds are deliberately generous (10×): the
  * point is to catch the 15-30× pathology class, not to flake on host
  * noise — both sides run in the same JVM back-to-back, so host speed
  * divides out.
  */
class BenchGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def timeMedian(s: SparkSession, name: String, passes: Int = 3): Double = {
    val fn = SparkEntry.queries(name)
    fn(s, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() // codegen warm
    val ts = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(passes / 2)
  }

  test("q132/q137 stay within 10x of the q104 family baseline at sf0.01") {
    val base = timeMedian(spark, "q104_tfidf_terms")
    val q132 = timeMedian(spark, "q132_lm_perplexity")
    val q137 = timeMedian(spark, "q137_pmi_collocations")
    assert(q132 < 10 * base + 2.0,
      f"q132 $q132%.2f s vs q104 baseline $base%.2f s — the r8 straggler " +
        "pathology shape may have returned (raw-occurrence shuffle?)")
    assert(q137 < 10 * base + 2.0,
      f"q137 $q137%.2f s vs q104 baseline $base%.2f s — relative blowout")
  }
}
