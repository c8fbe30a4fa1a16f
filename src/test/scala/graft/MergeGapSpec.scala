package graft

import graft.operators.{Analytics, ScalePatterns}
import org.apache.spark.sql.Row

/** Behavior proofs for the CDC merge (q124) and time-series gap fill
  * (q125) beyond the DuckDB hash gate: last-writer-wins semantics key by
  * key, and forward-fill carrying the correct last observation across
  * gaps.
  */
class MergeGapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q124 merge: updates win, inserts land, untouched rows unchanged") {
    val orig = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().map(r => r.getLong(0) -> r).toMap
    val merged = ScalePatterns.q124MergeUpsert.plan(spark, dir)
      .collect().map(r => r.getAs[Long]("o_orderkey") -> r).toMap

    assert(merged.size === orig.size + orig.keys.count(_ % 13 == 0))
    orig.foreach { case (k, r) =>
      val m = merged(k)
      if (k % 7 == 0) {
        assert(m.getAs[Long]("version") === 1L)
        assert(m.getAs[String]("o_orderstatus") === "R")
        assert(math.abs(m.getAs[Double]("o_totalprice")
          - (r.getDouble(1) + 10.0)) < 1e-9)
      } else {
        assert(m.getAs[Long]("version") === 0L)
        assert(m.getAs[Double]("o_totalprice") === r.getDouble(1))
        assert(m.getAs[String]("o_orderstatus") === r.getString(2))
      }
      if (k % 13 == 0) {
        val ins = merged(k + 1000000000L)
        assert(ins.getAs[Long]("version") === 1L)
        assert(ins.getAs[String]("o_orderstatus") === "N")
        assert(ins.getAs[Double]("o_totalprice") === r.getDouble(1))
      }
    }
  }

  test("q124 plan: pure hash aggregate — no window, no sort") {
    val df = ScalePatterns.q124MergeUpsert.plan(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("max_by"), plan.take(800))
  }

  test("q125 gap fill: dense calendar, carried-forward values, gap flags") {
    val rows = Analytics.q125GapFill.plan(spark, dir).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(byNation.size === 25)
    val spanDays = rows.map(_.getAs[java.sql.Date]("day")).distinct.length
    byNation.foreach { case (n, rs) =>
      assert(rs.length === spanDays, s"$n calendar not dense")
      var lastObserved = 0.0
      rs.sortBy(_.getAs[java.sql.Date]("day").toString).foreach { r =>
        if (!r.getAs[Boolean]("is_gap")) lastObserved = r.getAs[Double]("revenue_ff")
        else {
          assert(r.getAs[Double]("revenue_ff") === lastObserved,
            s"$n ${r.getAs[java.sql.Date]("day")}: fill broke the carry")
          assert(r.getAs[Long]("n_orders") === 0L)
        }
      }
    }
    // sf0.001 at nation grain genuinely has gaps — the fill did something
    assert(rows.count(_.getAs[Boolean]("is_gap")) > 0)
  }

  test("q125 plan: forward-fill window partitions by nation, never global") {
    val df = Analytics.q125GapFill.plan(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("n_name")),
      s"window must partition by n_name:\n${plan.take(1200)}")
  }

  test("q141: union of per-day sketches estimates like one global sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 disjoint "days" of 1000 users each + full overlap on day 4
    val rows = (1 to 3).flatMap(day =>
      (1 to 1000).map(u => (day, (day * 10000 + u).toLong))) ++
      (1 to 1000).map(u => (4, 10000L + u)) // duplicates day 1's users
    val df = rows.toDF("day", "user_id")
    val merged = df.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    // merge-of-partials must equal the single-pass sketch exactly (same
    // datasketches state) and land within 5% of the true 3000
    assert(merged === direct)
    assert(math.abs(merged - 3000.0) / 3000.0 < 0.05)
  }
}
