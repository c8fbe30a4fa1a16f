package graft.operators

import graft.core.{Num, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory — SURVEY.md §2.A–§2.D, §2.F–§2.H —
  * re-expressed as declarative DataFrame plans over the TPC-H-ish testdata.
  *
  * Reference semantics: l8knightz/intellect-bi builds every one of these as a
  * DuckDB SQL string in `api/main.py` (citations per query below). Here each
  * is a Catalyst logical plan: filters/projections reach the parquet scan
  * (PushedFilters / ReadSchema), aggregation is partial+final hash agg with
  * map-side combine, top-k is TakeOrderedAndProject, and joins pick
  * broadcast/SMJ via AQE (we hint broadcast only for genuinely small dims).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary — ref D1/D2/D3 grouped aggregates
    * (`api/main.py:673-682`, `:727-733`). Partial aggregation means the
    * shuffle carries ~|groups| rows per partition, not data rows — the plan
    * scales linearly to 100 TB.
    */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Num.dsum(col("l_quantity")).as("sum_qty"),
          Num.dsum(col("l_extendedprice")).as("sum_base_price"),
          Num.rsum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          Num.davg(col("l_quantity")).as("avg_qty"),
          Num.davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"),
        ),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Num.sqlDsum("l_quantity")} AS sum_qty,
             ${Num.sqlDsum("l_extendedprice")} AS sum_base_price,
             CAST(SUM(${Num.sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
             ${Num.sqlDavg("l_quantity")} AS avg_qty,
             ${Num.sqlDavg("l_extendedprice")} AS avg_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
    """),
  )

  /** Conjunctive predicates: equality, IN-list, half-open date range,
    * IS NOT NULL — ref B3/B4/B5/B6/B8/B9 (`api/main.py:466-484`,
    * `:749-757`, `:1155-1163`). All four predicates push down to the
    * parquet scan; only 4 of 6 columns are read.
    */
  val q02FilterPushdown = Q(
    "q02_filter_pushdown",
    (s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderstatus") === "O"
            && col("o_orderdate") >= lit("1998-04-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-07-01").cast("timestamp")
            && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            && col("o_totalprice").isNotNull)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus = 'O'
        AND o_orderdate >= TIMESTAMP '1998-04-01'
        AND o_orderdate < TIMESTAMP '1998-07-01'
        AND o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_totalprice IS NOT NULL
    """),
  )

  /** Scalar-function surface — ref H1–H11 (`api/main.py:440,508,698,1148,
    * 1154,1165,1053`): date_trunc, year/quarter extraction, epoch seconds,
    * interval month arithmetic, lower/initcap, coalesce, CASE WHEN, round.
    * Spark date_trunc returns TIMESTAMP while DuckDB returns DATE, so both
    * sides cast to DATE; DuckDB 1.x has no initcap, so the oracle emulates it
    * for the single-word status column.
    */
  val q03ScalarFuncs = Q(
    "q03_scalar_funcs",
    (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        lower(col("o_orderpriority")).as("pri_lower"),
        initcap(lower(col("o_orderstatus"))).as("status_cap"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
        when(col("o_totalprice") > 300000, "big").otherwise("small").as("size_class"),
        // exact-decimal multiply (never double-divide) before rounding:
        // engines disagree on double halfway cases (69.195 rounds to 69.20
        // via Spark's shortest-string BigDecimal but 69.19 from the binary
        // double), while DECIMAL round is HALF-UP in both
        round(col("o_totalprice").cast(Num.Money)
          * lit(new java.math.BigDecimal("0.001")), 2)
          .cast("double").as("kprice"),
      ),
    Some("""
      SELECT o_orderkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
             lower(o_orderpriority) AS pri_lower,
             upper(substr(lower(o_orderstatus),1,1)) || substr(lower(o_orderstatus),2) AS status_cap,
             coalesce(NULLIF(o_orderstatus,'O'), 'OPEN') AS status_or_open,
             CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_class,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.001 AS DECIMAL(4,3)), 2)
                  AS DOUBLE) AS kprice
      FROM orders
    """),
  )

  /** Ungrouped (grand-total) aggregate — ref D1/D2/D3/D4 global KPIs
    * (`api/main.py:665-688`, `:1142-1144`).
    */
  val q04GlobalAgg = Q(
    "q04_global_agg",
    (s, d) =>
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_orderdate")).cast("date").as("first_day"),
        max(col("o_orderdate")).cast("date").as("last_day"),
        Num.dsum(col("o_totalprice")).as("total_rev"),
        Num.davg(col("o_totalprice")).as("avg_rev"),
      ),
    Some(s"""
      SELECT count(*) AS n_rows,
             count(DISTINCT o_custkey) AS n_custs,
             CAST(min(o_orderdate) AS DATE) AS first_day,
             CAST(max(o_orderdate) AS DATE) AS last_day,
             ${Num.sqlDsum("o_totalprice")} AS total_rev,
             ${Num.sqlDavg("o_totalprice")} AS avg_rev
      FROM orders
    """),
  )

  /** Pearson correlation — ref D5 (`api/main.py:443-448`, transaction value
    * vs satisfaction). Rounded to 6 places: corr is a ratio of centered sums,
    * cross-engine drift ~1e-12.
    */
  val q05Corr = Q(
    "q05_corr",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(corr(col("l_discount"), col("l_extendedprice")), 6).as("disc_price_corr"),
      ),
    Some("""
      SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             round(corr(l_discount, l_extendedprice), 6) AS disc_price_corr
      FROM lineitem
    """),
  )

  /** Per-group OLS trend slope — ref D6 region-divergence
    * (`api/main.py:696-711`: regr_slope of metric vs epoch time per region).
    * regr_slope is a Spark 3.4+ built-in; x = days since the epoch anchor.
    */
  val q06TrendSlopes = Q(
    "q06_trend_slopes",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          round(
            regr_slope(
              col("o_totalprice"),
              datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("double")),
            6).as("price_slope"),
          count(lit(1)).as("n"),
        ),
    Some("""
      SELECT o_orderpriority,
             round(regr_slope(o_totalprice,
                   CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS DOUBLE)), 6) AS price_slope,
             count(*) AS n
      FROM orders
      GROUP BY o_orderpriority
    """),
  )

  /** Post-aggregation HAVING filter — ref D7 (`api/main.py:710`). Catalyst
    * folds `.agg(...).filter(...)` into the aggregate exactly like HAVING.
    */
  val q07Having = Q(
    "q07_having",
    (s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          Num.dsum(col("p_retailprice")).as("total_retail"),
          count(lit(1)).as("n_parts"))
        .filter(col("n_parts") >= 3),
    Some(s"""
      SELECT p_brand,
             ${Num.sqlDsum("p_retailprice")} AS total_retail,
             count(*) AS n_parts
      FROM part
      GROUP BY p_brand
      HAVING count(*) >= 3
    """),
  )

  /** Dimension-domain discovery — ref D8 (`api/main.py:345-360`:
    * SELECT DISTINCT per dimension, cached for filter binding).
    */
  val q08DistinctDomains = Q(
    "q08_distinct_domains",
    (s, d) => Tables.customer(s, d).select("c_mktsegment").distinct(),
    Some("SELECT DISTINCT c_mktsegment FROM customer"),
  )

  /** Multi-level re-aggregation + MoM growth — ref D9/E2
    * (`api/main.py:1087-1103`: daily SUM → monthly SUM → lag diff).
    * The decimal sum survives both levels; cast to double only at the end so
    * both engines derive the identical IEEE value.
    */
  val q09MonthlyMom = Q(
    "q09_monthly_mom",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(col("o_totalprice").cast(Num.Money)).as("rev"))
      val monthly = daily
        .groupBy(date_trunc("month", col("d")).cast("date").as("month"))
        .agg(sum(col("rev")).cast("double").as("m_rev"))
      monthly.withColumn(
        "mom_diff",
        col("m_rev") - lag(col("m_rev"), 1).over(Window.orderBy("month")))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      monthly AS (
        SELECT CAST(date_trunc('month', d) AS DATE) AS month,
               CAST(SUM(rev) AS DOUBLE) AS m_rev
        FROM daily GROUP BY 1)
      SELECT month, m_rev,
             m_rev - lag(m_rev) OVER (ORDER BY month) AS mom_diff
      FROM monthly
    """),
  )

  /** Grouped multi-metric aggregate — ref D10 (`api/main.py:750-759`:
    * SUM + AVG by month × region).
    */
  val q10MultiMetric = Q(
    "q10_multi_metric",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_orderstatus"))
        .agg(
          Num.dsum(col("o_totalprice")).as("rev"),
          Num.davg(col("o_totalprice")).as("avg_rev"),
          count(lit(1)).as("n")),
    Some(s"""
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             o_orderstatus,
             ${Num.sqlDsum("o_totalprice")} AS rev,
             ${Num.sqlDavg("o_totalprice")} AS avg_rev,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    """),
  )

  /** COUNT(DISTINCT) per group — exact distinct aggregation (expand +
    * two-phase agg in Spark). The approximate HLL variant for the 100 TB path
    * is `approx_count_distinct` (see Scale extensions).
    */
  val q11CountDistinct = Q(
    "q11_count_distinct",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n")),
    Some("""
      SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
      FROM orders GROUP BY o_orderstatus
    """),
  )

  /** Dimension join + top-N by aggregate — ref F2 (`api/main.py:724-733`)
    * over a C-family equi-join. No broadcast hint: `part` is only
    * *relatively* small (200k rows × sf; tens of GB at the 100 TB design
    * point), so a forced broadcast would OOM at scale. AQE broadcasts it at
    * small sf and shuffle-joins at scale — the right plan at every size.
    * The top-10 compiles to TakeOrderedAndProject (no global sort);
    * revenue is decimal-exact, so the ordering itself is deterministic.
    */
  val q12TopBrands = Q(
    "q12_top_brands",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(Num.rsum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("p_brand"))
        .limit(10)
    },
    Some(s"""
      SELECT p_brand,
             CAST(SUM(${Num.sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY revenue DESC, p_brand
      LIMIT 10
    """),
  )

  /** Multi-table join chain (TPC-H Q5 shape): region → nation → customer →
    * orders → lineitem. nation/region are tiny at any scale → broadcast;
    * customer⋈orders⋈lineitem shuffle on their keys and AQE handles skew.
    */
  /** q13, dense-map form: the whole dimension chain region→nation→customer
    * compiles into ONE orderkey→nationkey byte array (non-ASIA orders stay
    * unmapped, so the region FILTER rides the array too) — the fact scan
    * aggregates straight to the ≤5 nation codes with zero joins. Gated by
    * [[graft.core.DenseKeyMap]]; None past the cap → the join form below.
    */
  private[graft] def q13Dense(
      s: org.apache.spark.sql.SparkSession, d: String)
      : Option[org.apache.spark.sql.DataFrame] = {
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val asiaNat = nat
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
    val custPairs = cust
      .join(broadcast(asiaNat), cust("c_nationkey") === asiaNat("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, d)
    for {
      custMap <- graft.core.DenseKeyMap.build(
        // measuredScan: custPairs is a join (dimension-chain reduction),
        // whose default size estimate is meaninglessly multiplied — gate
        // on the raw customer scan, the honest upper bound on the pairs
        custPairs, "c_custkey", "c_nationkey", measuredScan = Some(cust))
      ordMap <- graft.core.DenseKeyMap.build(
        ord.select(col("o_orderkey"),
          custMap.code(col("o_custkey")).as("cnk")), "o_orderkey", "cnk")
    } yield Tables.lineitem(s, d)
      .select(ordMap.code(col("l_orderkey")).as("cnk"),
        col("l_extendedprice"), col("l_discount"))
      .filter(col("cnk").isNotNull) // non-ASIA order: the pushed filter
      .groupBy("cnk")
      .agg(Num.rsum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .join(broadcast(asiaNat), col("cnk") === asiaNat("n_nationkey"))
      .select(col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** The shuffle-join form — the shape past the dense-map cap (and the
    * PlanSpec surface for the statistics-gated broadcast hints).
    */
  private[graft] def q13JoinForm(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      // selectivity-first join order: the region filter keeps ~1/5 of
      // nations, so reducing customer through the broadcast dimension
      // chain FIRST shrinks orders to ~20% before the fact join —
      // declared fact-side-first, the l⋈o exchange carried every
      // lineitem against the FULL orders side and the region filter
      // only applied at the end. The custAsia broadcast hint is
      // STATISTICS-DERIVED, not forced (the q45 saltFor stance): an
      // explicit broadcast() is never demoted by AQE, so an
      // unconditional hint would hard-fail at a scale where
      // customers-per-region exceeds the broadcast limits. It is
      // applied only while the customer scan is dimension-sized
      // (≤512 MB, a quarter of the 8 GB/512M-row broadcast ceiling —
      // file-size statistics, no job); past that the hint is absent
      // and the join shuffles on custkey — which also removes the
      // small-sf static misestimate where the planner broadcast the
      // 2-column orders SCAN (the bigger side) instead.
      // late materialization: the fact join carries the 4-byte
      // n_nationkey, not the n_name string, so the reduced orders side
      // sits well under the adaptive broadcast threshold — AQE's final
      // plan (verified isFinalPlan=true) broadcasts it and reads the
      // lineitem exchange locally, skipping the sort-merge sort; n_name
      // attaches to the 5 aggregated rows at the end. Locally this is
      // parity with the old shape (the lineitem map write remains);
      // the scale win is structural — the fact is exchanged ONCE, on
      // orderkey, instead of every joined lineitem row re-shuffling on
      // custkey before the dimension filter applied.
      val asiaNat = nat
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val custAsia = cust
        .join(broadcast(asiaNat), cust("c_nationkey") === asiaNat("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val custAsiaH = graft.core.Hints.broadcastIfDimSized(custAsia, cust)
      val ordAsia = ord
        .join(custAsiaH, ord("o_custkey") === custAsiaH("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      li.join(ordAsia, li("l_orderkey") === ordAsia("o_orderkey"))
        .groupBy("c_nationkey")
        .agg(Num.rsum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .join(broadcast(asiaNat), col("c_nationkey") === asiaNat("n_nationkey"))
        .select(col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
  }

  val q13RegionRevenue = Q(
    "q13_region_revenue",
    (s, d) => q13Dense(s, d).getOrElse(q13JoinForm(s, d)),
    Some(s"""
      SELECT n_name,
             CAST(SUM(${Num.sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """),
  )

  /** Left-semi join (EXISTS / IN-subquery) — ref C3 (`api/main.py:465`,
    * `:1200`). The semi-join carries only the left side through the shuffle.
    */
  val q14SemiJoin = Q(
    "q14_semi_join",
    (s, d) => {
      val ord = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """),
  )

  /** Left-anti join (NOT EXISTS) — orders with no high-quantity line item.
    * (Every synthetic customer has orders, so the customer-without-orders
    * form returned 0 rows — a vacuous correctness signal; this form
    * selects a real subset at every scale factor.)
    */
  val q15AntiJoin = Q(
    "q15_anti_join",
    (s, d) => {
      val ord = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") > 40)
      ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity > 40)
    """),
  )

  /** Year-over-year by quarter — ref C1 self left-join
    * (`api/main.py:502-518`). Implemented as `lag(rev, 4)` over the
    * contiguous quarter series (SURVEY §2.C: same semantics, no self-join
    * shuffle); the oracle uses the identical window form. The quarter series
    * is tiny at any scale (≤ a few hundred rows), so the unpartitioned window
    * is a single lightweight task after aggregation.
    */
  val q16YoyQuarter = Q(
    "q16_yoy_quarter",
    (s, d) => {
      val q = Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(sum(col("o_totalprice").cast(Num.Money)).as("rev"))
      val w = Window.orderBy("yr", "qtr")
      q.select(
        col("yr"), col("qtr"),
        col("rev").cast("double").as("revenue"),
        lag(col("rev"), 4).over(w).cast("double").as("prior_year_revenue"))
        .withColumn(
          "yoy_pct",
          round((col("revenue") - col("prior_year_revenue"))
            / col("prior_year_revenue") * 100, 4))
    },
    Some("""
      WITH q AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      w AS (
        SELECT yr, qtr, CAST(rev AS DOUBLE) AS revenue,
               CAST(lag(rev, 4) OVER (ORDER BY yr, qtr) AS DOUBLE) AS prior_year_revenue
        FROM q)
      SELECT yr, qtr, revenue, prior_year_revenue,
             round((revenue - prior_year_revenue) / prior_year_revenue * 100, 4) AS yoy_pct
      FROM w
    """),
  )

  /** Quarter-over-quarter delta, latest quarter only — ref C4 scalar-subquery
    * current/previous/delta (`api/main.py:479-497`), via lag + top-1.
    */
  val q17QoqDelta = Q(
    "q17_qoq_delta",
    (s, d) => {
      val q = Tables.orders(s, d)
        .groupBy(date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"))
        .agg(sum(col("o_totalprice").cast(Num.Money)).as("rev"))
      val w = Window.orderBy("quarter_start")
      q.select(
        col("quarter_start"),
        col("rev").cast("double").as("curr"),
        lag(col("rev"), 1).over(w).cast("double").as("prev"))
        .withColumn("delta", col("curr") - col("prev"))
        .orderBy(col("quarter_start").desc)
        .limit(1)
    },
    Some("""
      WITH q AS (
        SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      w AS (
        SELECT quarter_start, CAST(rev AS DOUBLE) AS curr,
               CAST(lag(rev) OVER (ORDER BY quarter_start) AS DOUBLE) AS prev
        FROM q)
      SELECT quarter_start, curr, prev, curr - prev AS delta
      FROM w ORDER BY quarter_start DESC LIMIT 1
    """),
  )

  /** Top-1-per-group via row_number — ref E1 (`api/main.py:1040`). The window
    * partitions by customer, so it scales horizontally; the unique orderkey
    * tiebreak makes the pick deterministic.
    */
  val q18WindowRownum = Q(
    "q18_window_rownum",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey").as("c_custkey"),
          col("o_orderkey"),
          col("o_totalprice"))
    },
    Some("""
      SELECT c_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn = 1
    """),
  )

  /** Rolling 7-row mean over the daily series — ref I5/E rolling
    * (`api/analytics.py:79-92`: pandas rolling(7, min_periods=1).mean()).
    */
  val q19RollingAvg = Q(
    "q19_rolling_avg",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(col("o_totalprice").cast(Num.Money)).cast("double").as("rev"))
      val w = Window.orderBy("d").rowsBetween(-6, 0)
      daily.withColumn("ma7", round(avg(col("rev")).over(w), 4))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1)
      SELECT d, rev,
             round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
      FROM daily
    """),
  )

  /** ORDER BY … DESC NULLS LAST LIMIT 1 — ref F4 month-with-highest-growth
    * (`api/main.py:1101-1102`); first month has NULL growth.
    */
  val q20BestGrowthMonth = Q(
    "q20_best_growth_month",
    (s, d) =>
      q09MonthlyMom.plan(s, d)
        .orderBy(col("mom_diff").desc_nulls_last, col("month"))
        .limit(1),
    q09MonthlyMom.oracle.map(base => s"""
      WITH base AS ($base)
      SELECT month, m_rev, mom_diff FROM base
      ORDER BY mom_diff DESC NULLS LAST, month LIMIT 1
    """),
  )

  /** LIMIT … OFFSET — ref F5 previous-quarter via OFFSET 1
    * (`api/main.py:495`); Dataset.offset is native in Spark 3.4+.
    */
  val q21SecondMonth = Q(
    "q21_second_month",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(Num.dsum(col("o_totalprice")).as("m_rev"))
      monthly.orderBy(col("m_rev").desc, col("month")).offset(1).limit(1)
    },
    Some(s"""
      WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ${Num.sqlDsum("o_totalprice")} AS m_rev
        FROM orders GROUP BY 1)
      SELECT month, m_rev FROM monthly
      ORDER BY m_rev DESC, month LIMIT 1 OFFSET 1
    """),
  )

  /** K most recent periods — ref F3 two most recent quarters
    * (`api/main.py:452-459`, `:1186-1193`).
    */
  val q22RecentQuarters = Q(
    "q22_recent_quarters",
    (s, d) =>
      Tables.orders(s, d)
        .select(date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr"))
        .distinct()
        .orderBy(col("qtr").desc)
        .limit(2),
    Some("""
      SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr
      FROM orders ORDER BY qtr DESC LIMIT 2
    """),
  )

  /** UNION (distinct) — §2.G set operations. */
  val q23Union = Q(
    "q23_union",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        .union(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
        .distinct()
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """),
  )

  /** INTERSECT — §2.G. */
  val q24Intersect = Q(
    "q24_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """),
  )

  /** EXCEPT — §2.G. */
  val q25Except = Q(
    "q25_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """),
  )

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterPushdown, q03ScalarFuncs, q04GlobalAgg,
    q05Corr, q06TrendSlopes, q07Having, q08DistinctDomains, q09MonthlyMom,
    q10MultiMetric, q11CountDistinct, q12TopBrands, q13RegionRevenue,
    q14SemiJoin, q15AntiJoin, q16YoyQuarter, q17QoqDelta, q18WindowRownum,
    q19RollingAvg, q20BestGrowthMonth, q21SecondMonth, q22RecentQuarters,
    q23Union, q24Intersect, q25Except,
  )
}
