package graft

import org.apache.spark.sql.functions._

/** Semantic-equivalence checks for the Expand-avoiding reshapes of the
  * sketch-family queries (q44 / q98 / q165): each reshaped plan must
  * produce BIT-IDENTICAL results to the naive formulation it replaced,
  * on randomized data with duplicates, skew and NULLs — not just on the
  * oracle fixture. Seeded generators keep the suite deterministic.
  */
class SketchShapesSpec extends SparkSpec {

  test("q44 shape: dedupe-then-sketch == countDistinct+HLL in one agg") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    // skewed keys (Zipf-ish via squaring) and ~2% nulls
    val rows = Seq.fill(20000) {
      val s = "FOP".charAt(rnd.nextInt(3)).toString
      val k = if (rnd.nextInt(50) == 0) null
              else java.lang.Long.valueOf((rnd.nextDouble() * rnd.nextDouble() * 3000).toLong)
      (s, k)
    }
    val df = rows.toDF("st", "k")
    val naive = df.groupBy("st")
      .agg(countDistinct(col("k")).as("exact_n"),
        approx_count_distinct(col("k"), 0.02).as("approx_n"))
    val reshaped = df.groupBy("st", "k").agg(count(lit(1)).as("nn"))
      .groupBy("st")
      .agg(count(col("k")).as("exact_n"),
        approx_count_distinct(col("k"), 0.02).as("approx_n"))
    val a = naive.orderBy("st").collect().toSeq
    val b = reshaped.orderBy("st").collect().toSeq
    // exact counts match AND the HLL estimates are bit-identical: the
    // registers only record max leading-zero runs per bucket, which
    // duplicates cannot change
    assert(a == b, s"naive=$a reshaped=$b")
  }

  test("q98 shape: per-column branch profile == Expand-shape profile") {
    import spark.implicits._
    val rnd = new scala.util.Random(98)
    val df = Seq.fill(5000) {
      (if (rnd.nextInt(10) == 0) null
       else java.lang.Double.valueOf((rnd.nextInt(500) / 7.0)),
        if (rnd.nextInt(20) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(40).toDouble))
    }.toDF("a", "b")
    val cols = Seq("a", "b")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_n"),
      sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls"),
      countDistinct(col(c)).as(s"${c}_nd"),
      round(min(col(c)), 6).as(s"${c}_min"),
      round(max(col(c)), 6).as(s"${c}_max")))
    val naive = df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, " + cols.map(c =>
        s"'$c', ${c}_n, ${c}_nulls, ${c}_nd, ${c}_min, ${c}_max")
        .mkString(", ") + ") as (col_name, n, n_nulls, n_distinct, min_v, max_v)")
    val reshaped = cols.map { c =>
      df.select(col(c).as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(lit(c).as("col_name"),
          sum(col("cnt")).as("n_all"),
          sum(when(col("v").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
          round(min(col("v")), 6).as("min_v"),
          round(max(col("v")), 6).as("max_v"))
        .select(col("col_name"), (col("n_all") - col("n_nulls")).as("n"),
          col("n_nulls"), col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_.unionByName(_))
    assert(naive.orderBy("col_name").collect().toSeq ==
      reshaped.orderBy("col_name").collect().toSeq)
  }

  test("q165 shape: flag-frame overlaps == distinct-join overlaps; union sketches == filtered sketches") {
    import spark.implicits._
    val rnd = new scala.util.Random(165)
    val types = Seq("view", "purchase", "error")
    val e = Seq.fill(30000) {
      (s"u${rnd.nextInt(800)}", types(rnd.nextInt(3)))
    }.toDF("user_id", "event_type")
    val segPairs = Seq(("view", "purchase"), ("view", "error"), ("purchase", "error"))
    // exact overlaps: per-user flag frame vs the distinct-set join
    def flag(t: String) =
      max(when(col("event_type") === t, 1).otherwise(0)).as(s"f_$t")
    val flags = e.groupBy("user_id").agg(flag(types.head), types.tail.map(flag): _*)
    segPairs.foreach { case (a, b) =>
      val viaFlags = flags.agg(
        coalesce(sum(col(s"f_$a") * col(s"f_$b")), lit(0L))).head().getLong(0)
      val viaJoin = e.filter(col("event_type") === a).select("user_id").distinct()
        .join(e.filter(col("event_type") === b).select("user_id").distinct(), "user_id")
        .count()
      assert(viaFlags == viaJoin, s"($a,$b): flags=$viaFlags join=$viaJoin")
      // pair-union sketch over the full stream (when-filtered) equals the
      // sketch over the isin-prefiltered stream — same inserted multiset
      val uFull = e.agg(approx_count_distinct(
        when(col("event_type").isin(a, b), col("user_id")), 0.02)).head().getLong(0)
      val uFiltered = e.filter(col("event_type").isin(a, b))
        .agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
      assert(uFull == uFiltered, s"($a,$b): full=$uFull filtered=$uFiltered")
    }
  }
}
