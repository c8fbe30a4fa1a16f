package graft.operators

import graft.core.{Num, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics at an ARBITRARY probe set — the
  * generalization of q121/q122's two-probe winsor bracket to K
  * simultaneous cut points, applied here as equal-frequency decile
  * binning (the feature-bucketization / histogram-equalization step of a
  * training pipeline; the reference's only quantile surface is DuckDB's
  * built-in `quantile_cont`, api/main.py's percentile endpoints).
  *
  * Why not `ntile(10) OVER (ORDER BY v)`: a global-ORDER window funnels
  * every row through ONE task's sort buffer — the canonical
  * does-not-scale plan. Why not exact `percentile`: a single
  * O(distinct-values) aggregation buffer merged in one final task (the
  * round-6 verdict's scale-killer, removed from this catalog). The
  * bracket technique keeps every stage partial/mergeable:
  *
  *   1. ONE `approx_percentile` sketch pass yields a bracket
  *      [lb_k, ub_k] around every cut k — rank error ≤ n/Acc < W·n, so
  *      the true rank-r_k value provably lies inside bracket k.
  *   2. ONE grouped pass buckets rows by bracket region: in-bracket
  *      values keep their identity (one cell per value), the K+1
  *      between-bracket regions COLLAPSE to one cell each carrying
  *      (count, exact-decimal sum, min, max) — so the cells frame is
  *      sketch-bounded, never O(n).
  *   3. Cut k = the exact LOWER order statistic at rank ⌈k·n/10⌉, read
  *      off the cells' cumulative counts (a window over the tiny cells
  *      frame, never the raw column). Type-1 quantiles on purpose: every
  *      cut is an actual data value — no interpolation, no float-ulp
  *      cross-engine fragility at all.
  *   4. The per-bin aggregate is computed FROM THE CELLS, not a third
  *      scan: a between-bracket cell lies strictly inside
  *      (ub_{k-1}, lb_k) ⊆ (cut_{k-1}, cut_k], so every cell maps wholly
  *      to one bin and bin stats are exact cell-stat re-aggregations.
  *
  * Two scans total, every aggregate map-side-combinable, the only window
  * runs over the sketch-bounded cells — the shape that survives 100 TB.
  */
object Quantiles {

  private val K = 9 // decile cuts
  private val Acc = 10000 // approx_percentile rank error <= n/Acc
  private val W = 5e-4 // bracket half-width in percentile space
  private val SmallN = 100000L // below this the whole column is the histogram

  /** Step 1+2: sketch-bracketed cells for column `c` of `li`. One row per
    * in-bracket value plus one per collapsed between-bracket region,
    * carrying (cnt, exact-decimal vsum, vmin, vmax, n).
    */
  private[graft] def decileCells(li: DataFrame, c: String,
      smallN: Long = SmallN): DataFrame = {
    val probes = (1 to K).flatMap(k => Seq(k / 10.0 - W, k / 10.0 + W))
    val stats = li.agg(
      count(col(c)).as("n"),
      expr(s"approx_percentile($c, array(${probes.mkString(",")}), $Acc)").as("pr"))
      .select(col("n") +: (1 to K).flatMap(k => Seq(
        col("pr")(2 * (k - 1)).as(s"lb$k"),
        col("pr")(2 * k - 1).as(s"ub$k"))): _*)
    val v = col("v")
    val bucket = (1 to K).foldLeft(when(col("n") < smallN, lit(1))) {
      (e, k) =>
        e.when(v < col(s"lb$k"), lit(2 * k - 2))
          .when(v <= col(s"ub$k"), lit(2 * k - 1))
    }.otherwise(lit(2 * K))
    li.select(col(c).as("v"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"), when(col("bucket") % 2 === 1, v).as("bv"))
      .agg(count(lit(1)).as("cnt"),
        Num.dsumDec(v).as("vsum"),
        min(v).as("vmin"), max(v).as("vmax"),
        max(col("n")).as("n"))
  }

  /** Step 3: the 9 exact lower order statistics (rank ⌈k·n/10⌉) as a
    * 1-row frame (c1..c9) for broadcast, read off the cells' cumulative
    * counts in value order (bucket order IS value order by construction
    * of the bucket CASE chain).
    */
  private[graft] def decileCuts(cells: DataFrame): DataFrame = {
    val ranked = cells.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"), col("bv"))))
    val cs = (1 to K).map(k =>
      min(when(col("cum") >= expr(s"(n * $k + 9) DIV 10"), col("bv")))
        .as(s"c$k"))
    ranked.agg(cs.head, cs.tail: _*)
  }

  /** Which bin a value (or a whole collapsed cell, via its min) falls in:
    * 1 + number of cuts strictly below it.
    */
  private def binOf(v: Column): Column =
    (1 to K).map(k => when(v > col(s"c$k"), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)

  /** Equal-frequency decile binning of lineitem extended price: exact
    * type-1 decile cuts, then per-bin row counts, exact-decimal sums and
    * min/max — all re-aggregated from the cells (two scans total).
    */
  val q128QuantileBins = Q(
    "q128_quantile_bins",
    (s, d) => {
      val cells = decileCells(Tables.lineitem(s, d), "l_extendedprice")
        .localCheckpoint(true)
      cells
        .crossJoin(broadcast(decileCuts(cells)))
        .withColumn("bin", binOf(coalesce(col("bv"), col("vmin"))))
        .groupBy("bin")
        .agg(sum(col("cnt")).as("n"),
          sum(col("vsum")).cast("double").as("sum_price"),
          min(col("vmin")).as("min_price"),
          max(col("vmax")).as("max_price"))
    },
    Some("""
      WITH nn AS (SELECT count(*) AS n FROM lineitem),
      srt AS (SELECT l_extendedprice AS v,
                     row_number() OVER (ORDER BY l_extendedprice) AS i
              FROM lineitem),
      cuts AS (SELECT
          max(CASE WHEN i = (n * 1 + 9) // 10 THEN v END) AS c1,
          max(CASE WHEN i = (n * 2 + 9) // 10 THEN v END) AS c2,
          max(CASE WHEN i = (n * 3 + 9) // 10 THEN v END) AS c3,
          max(CASE WHEN i = (n * 4 + 9) // 10 THEN v END) AS c4,
          max(CASE WHEN i = (n * 5 + 9) // 10 THEN v END) AS c5,
          max(CASE WHEN i = (n * 6 + 9) // 10 THEN v END) AS c6,
          max(CASE WHEN i = (n * 7 + 9) // 10 THEN v END) AS c7,
          max(CASE WHEN i = (n * 8 + 9) // 10 THEN v END) AS c8,
          max(CASE WHEN i = (n * 9 + 9) // 10 THEN v END) AS c9
        FROM srt, nn),
      b AS (SELECT l_extendedprice AS v,
              1 + (CASE WHEN l_extendedprice > c1 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c2 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c3 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c4 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c5 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c6 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c7 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c8 THEN 1 ELSE 0 END)
                + (CASE WHEN l_extendedprice > c9 THEN 1 ELSE 0 END) AS bin
            FROM lineitem, cuts)
      SELECT bin, count(*) AS n,
             CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             min(v) AS min_price, max(v) AS max_price
      FROM b GROUP BY bin
    """),
  )

  /** Sketch-bracketed cells at a single probe p for column `c` — the
    * 1-cut specialization of [[decileCells]] (bucket 0 below the bracket,
    * 1 inside, 2 above).
    */
  private[graft] def p50Cells(df: DataFrame, c: String): DataFrame = {
    val stats = df.agg(
      count(col(c)).as("n"),
      expr(s"approx_percentile($c, array(${0.5 - W}, ${0.5 + W}), $Acc)").as("pr"))
      .select(col("n"), col("pr")(0).as("lb"), col("pr")(1).as("ub"))
    val v = col("v")
    df.select(col(c).as("v"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("n") < SmallN, lit(1))
          .when(v < col("lb"), lit(0))
          .when(v <= col("ub"), lit(1))
          .otherwise(lit(2)))
      .groupBy(col("bucket"), when(col("bucket") === 1, v).as("bv"))
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
  }

  /** Exact type-1 lower median (rank ⌈n/2⌉) off [[p50Cells]]' cumulative
    * counts, as a 1-row frame for broadcast.
    */
  private[graft] def medianFromCells(cells: DataFrame): DataFrame = {
    val ranked = cells.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"), col("bv"))))
    ranked.agg(
      min(when(col("cum") >= expr("(n + 1) DIV 2"), col("bv"))).as("m"))
  }

  /** Robust outlier detection via MEDIAN / MAD — the outlier treatment
    * that, unlike z-scores, is not itself corrupted by the outliers it
    * hunts: flag values with |x − median| > 3·1.4826·MAD (1.4826 scales
    * MAD to σ under normality). Both order statistics come from the
    * bracket technique — never Spark's single-buffer `percentile`, never
    * a global sort — so the plan is FIVE distributed passes, all
    * partial/mergeable: sketch(x), cells(x) → median; sketch(|x−med|),
    * cells(|x−med|) → MAD (the deviation passes cannot reuse x's cells:
    * |x−med| folds both tails together, and collapsed out-of-bracket
    * cells have lost the identity that folding needs); one final map-side
    * count against the broadcast (med, mad) thresholds. Deviations of a
    * 2-decimal column from its 2-decimal median are exact in IEEE, and
    * the threshold comparison multiplies identical doubles in both
    * engines — no rounding fragility anywhere.
    */
  val q156MadOutliers = Q(
    "q156_mad_outliers",
    (s, d) => {
      // The five passes run over ONE materialization of the narrow
      // (flag, value) projection, not five parquet scans: a multi-pass
      // order-statistics algorithm is exactly the case where
      // persist-once (spillable, 2 columns ≈ 12 bytes/row) beats
      // re-decoding the pruned scan per pass — at 100 TB the projection
      // is ~1% of the fact table's bytes and every subsequent pass is a
      // memory-speed map over it.
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .localCheckpoint(true)
      val med = medianFromCells(p50Cells(li, "l_extendedprice"))
        .select(col("m").as("med"))
      val devs = li
        .select(col("l_returnflag"), col("l_extendedprice").as("x"))
        .crossJoin(broadcast(med))
        .withColumn("dv", abs(col("x") - col("med")))
      val mad = medianFromCells(p50Cells(devs, "dv"))
        .select(col("m").as("mad"))
      devs.crossJoin(broadcast(mad))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("dv") > col("mad") * 4.4478, 1L).otherwise(0L))
            .as("n_outliers"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"))
    },
    Some("""
      WITH nn AS (SELECT count(*) AS n FROM lineitem),
      srt AS (SELECT l_extendedprice AS v,
                     row_number() OVER (ORDER BY l_extendedprice) AS i
              FROM lineitem),
      med AS (SELECT max(CASE WHEN i = (n + 1) // 2 THEN v END) AS med
              FROM srt, nn),
      dev AS (SELECT l_returnflag, abs(l_extendedprice - med) AS dv, med
              FROM lineitem, med),
      dsrt AS (SELECT dv, row_number() OVER (ORDER BY dv) AS i FROM dev),
      mad AS (SELECT max(CASE WHEN i = (n + 1) // 2 THEN dv END) AS mad
              FROM dsrt, nn)
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CASE WHEN dv > mad * 4.4478 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
             max(med) AS med, max(mad) AS mad
      FROM dev, mad GROUP BY l_returnflag
    """),
  )

  /** Grouped variant of [[p50Cells]]: one grouped sketch pass yields each
    * group its own p50 bracket; rows bucket against THEIR group's bracket
    * (broadcast join on the group key — group cardinality is small); the
    * per-group SmallN fallback rides in the same CASE. Cells carry
    * (keys, bucket, bv, cnt, n_g).
    */
  private[graft] def groupP50Cells(
      df: DataFrame, c: String, keys: Seq[String]): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*).agg(
      count(col(c)).as("n"),
      expr(s"approx_percentile($c, array(${0.5 - W}, ${0.5 + W}), $Acc)").as("pr"))
      .select((keys.map(col) :+ col("n") :+
        col("pr")(0).as("lb") :+ col("pr")(1).as("ub")): _*)
    val v = col("v")
    df.select((keys.map(col) :+ col(c).as("v")): _*)
      .join(broadcast(stats), keys)
      .withColumn("bucket",
        when(col("n") < SmallN, lit(1))
          .when(v < col("lb"), lit(0))
          .when(v <= col("ub"), lit(1))
          .otherwise(lit(2)))
      .groupBy((keys.map(col) :+ col("bucket") :+
        when(col("bucket") === 1, v).as("bv")): _*)
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
  }

  /** Per-group exact type-1 lower medians off [[groupP50Cells]]: the
    * cumulative window PARTITIONS BY GROUP (parallel across keys,
    * sketch-bounded within each). Returns (keys..., m).
    */
  private[graft] def groupMedianFromCells(
      cells: DataFrame, keys: Seq[String]): DataFrame = {
    val ranked = cells.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(keys.map(col): _*)
        .orderBy(col("bucket"), col("bv"))))
    ranked.groupBy(keys.map(col): _*)
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("bv"))).as("m"))
  }

  /** PER-GROUP robust MAD outliers — the grouped form of [[q156MadOutliers]]
    * (the q121→q122 progression applied to the median/MAD family): each
    * group gets its OWN median, its own MAD over deviations from that
    * median, and its own 3σ-equivalent threshold. All order statistics
    * come from grouped sketch brackets — one grouped sketch + one grouped
    * cells pass per statistic, group-partitioned windows over
    * sketch-bounded histograms, group-keyed broadcast joins — so no
    * per-group value buffer and no exact-percentile aggregate exists
    * anywhere in the plan, at any group count.
    */
  val q163GroupMadOutliers = Q(
    "q163_group_mad_outliers",
    (s, d) => {
      val keys = Seq("l_returnflag")
      // one materialized narrow projection feeds all five grouped
      // passes — see q156's scan-sharing note
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .localCheckpoint(true)
      val med = groupMedianFromCells(
        groupP50Cells(li, "l_extendedprice", keys), keys)
        .withColumnRenamed("m", "med")
      val devs = li
        .select((keys.map(col) :+ col("l_extendedprice").as("x")): _*)
        .join(broadcast(med), keys)
        .withColumn("dv", abs(col("x") - col("med")))
      val mad = groupMedianFromCells(groupP50Cells(devs, "dv", keys), keys)
        .withColumnRenamed("m", "mad")
      devs.join(broadcast(mad), keys)
        .groupBy(keys.map(col): _*)
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("dv") > col("mad") * 4.4478, 1L).otherwise(0L))
            .as("n_outliers"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"))
    },
    Some("""
      WITH n AS (
        SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1),
      srt AS (
        SELECT l_returnflag, l_extendedprice AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS i
        FROM lineitem),
      med AS (
        SELECT srt.l_returnflag,
               max(CASE WHEN i = (n + 1) // 2 THEN v END) AS med
        FROM srt JOIN n USING (l_returnflag) GROUP BY 1),
      dev AS (
        SELECT l.l_returnflag, abs(l_extendedprice - med) AS dv, med
        FROM lineitem l JOIN med USING (l_returnflag)),
      dsrt AS (
        SELECT l_returnflag, dv, med,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY dv) AS i
        FROM dev),
      mad AS (
        SELECT dsrt.l_returnflag,
               max(CASE WHEN i = (n + 1) // 2 THEN dv END) AS mad
        FROM dsrt JOIN n USING (l_returnflag) GROUP BY 1)
      SELECT d.l_returnflag, count(*) AS n,
             CAST(sum(CASE WHEN dv > mad * 4.4478 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
             max(d.med) AS med, max(mad.mad) AS mad
      FROM dev d JOIN mad USING (l_returnflag) GROUP BY 1
    """),
  )

  val all: Seq[Q] = Seq(q128QuantileBins, q156MadOutliers, q163GroupMadOutliers)
}
