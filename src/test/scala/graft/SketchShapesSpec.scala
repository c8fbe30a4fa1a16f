package graft

import org.apache.spark.sql.functions._

/** Semantic-equivalence checks for the Expand-avoiding reshapes of the
  * sketch-family queries (q44 / q98 / q165): each PRODUCTION core
  * (`ScalePatterns.approxDistinctContract` / `profileColumns` /
  * `audienceOverlap` — the same code the catalog queries call) must
  * produce results identical to the naive formulation it replaced, on
  * randomized data with duplicates, skew, NULL keys and (for q165)
  * non-segment event types — not just on the oracle fixture. Seeded
  * generators keep the suite deterministic.
  */
class SketchShapesSpec extends SparkSpec {

  import graft.operators.ScalePatterns

  test("q44 core: dedupe-then-sketch == countDistinct+HLL in one agg") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    // skewed keys (Zipf-ish via squaring) and ~2% nulls
    val rows = Seq.fill(20000) {
      val s = "FOP".charAt(rnd.nextInt(3)).toString
      val k = if (rnd.nextInt(50) == 0) null
              else java.lang.Long.valueOf((rnd.nextDouble() * rnd.nextDouble() * 3000).toLong)
      (s, k)
    }
    val df = rows.toDF("o_orderstatus", "o_custkey")
    val naive = df.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("exact_n"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_n"))
      .select(col("o_orderstatus"), col("exact_n"),
        (col("exact_n") === 0 ||
          abs(col("approx_n") - col("exact_n")) / col("exact_n") <= 0.05)
          .as("approx_within_5pct"))
    val prod = ScalePatterns.approxDistinctContract(df)
    // exact counts match AND the flag derived from the HLL estimate is
    // identical: the registers only record max leading-zero runs per
    // bucket, which duplicates cannot change
    assert(naive.orderBy("o_orderstatus").collect().toSeq ==
      prod.orderBy("o_orderstatus").collect().toSeq)
  }

  test("q98 core: per-column branch profile == Expand-shape profile") {
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
    val prod = ScalePatterns.profileColumns(df, cols)
    assert(naive.orderBy("col_name").collect().toSeq ==
      prod.orderBy("col_name").collect().toSeq)
    // empty-input parity with the naive shape (count→0, SQL sum→NULL)
    val empty = df.filter(lit(false))
    val naiveEmpty = empty.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, " + cols.map(c =>
        s"'$c', ${c}_n, ${c}_nulls, ${c}_nd, ${c}_min, ${c}_max")
        .mkString(", ") + ") as (col_name, n, n_nulls, n_distinct, min_v, max_v)")
    assert(naiveEmpty.orderBy("col_name").collect().toSeq ==
      ScalePatterns.profileColumns(empty, cols).orderBy("col_name").collect().toSeq)
  }

  test("q165 core: flag-frame overlaps == distinct-join overlaps; union sketches == filtered sketches") {
    import spark.implicits._
    val rnd = new scala.util.Random(165)
    // includes a NON-SEGMENT type ('click') and ~2% NULL users: both must
    // be invisible to the result, as they were to the distinct-set joins
    val types = Seq("view", "purchase", "error", "click")
    val e = Seq.fill(30000) {
      (if (rnd.nextInt(50) == 0) null else s"u${rnd.nextInt(800)}",
        types(rnd.nextInt(4)))
    }.toDF("user_id", "event_type")
    val segPairs = Seq(("view", "purchase"), ("view", "error"), ("purchase", "error"))
    val prod = ScalePatterns.audienceOverlap(e).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    segPairs.foreach { case (a, b) =>
      // exact overlaps: production core vs the distinct-set join (NULL
      // join keys never match, like the oracle's JOIN USING)
      val viaJoin = e.filter(col("event_type") === a).select("user_id").distinct()
        .join(e.filter(col("event_type") === b).select("user_id").distinct(), "user_id")
        .count()
      assert(prod((a, b)) == viaJoin, s"($a,$b): prod=${prod((a, b))} join=$viaJoin")
      // pair-union sketch over the full stream (when-filtered) equals the
      // sketch over the isin-prefiltered stream — same inserted multiset
      val uFull = e.agg(approx_count_distinct(
        when(col("event_type").isin(a, b), col("user_id")), 0.02)).head().getLong(0)
      val uFiltered = e.filter(col("event_type").isin(a, b))
        .agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
      assert(uFull == uFiltered, s"($a,$b): full=$uFull filtered=$uFiltered")
      // HLL duplicate-insensitivity — the property the production
      // single-scan shape rests on: sketching each user ONCE (via the
      // distinct-user frame) builds the identical register state as
      // sketching one insert per matching event, so the one-agg rewrite
      // is estimate-preserving, not just tolerance-preserving
      val uDistinct = e.filter(col("user_id").isNotNull &&
          col("event_type").isin(a, b))
        .select("user_id").distinct()
        .agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
      val uStream = e.filter(col("user_id").isNotNull &&
          col("event_type").isin(a, b))
        .agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
      assert(uDistinct == uStream,
        s"($a,$b): distinct-fed=$uDistinct stream-fed=$uStream")
    }
  }
}
