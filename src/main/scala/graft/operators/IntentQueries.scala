package graft.operators

import graft.core.Q
import graft.intent.{IntentCompiler, IntentParser, SalesView, Templates}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog entries for the NL front-end — each runs a natural-language
  * question through Router-compatible parsing (K3–K7), the intent→plan
  * compiler (K8) or the template dispatcher (K9), over the derived
  * [[SalesView]]. The DuckDB oracles recompute the same result from the
  * orders parquet, so the ENTIRE NL→intent→plan→result path is
  * differential-tested, not just the leaf plans.
  */
object IntentQueries {

  private val dsumSales =
    "CAST(SUM(CAST(sales AS DECIMAL(18,2))) AS DOUBLE)"
  private val davgSat =
    "CAST(SUM(CAST(satisfaction AS DECIMAL(18,2))) AS DOUBLE)/count(satisfaction)"

  private def compiled(q: String): (SparkSession, String) => DataFrame =
    (s, d) => {
      val sv = SalesView(s, d)
      IntentCompiler.compile(q, sv, IntentParser.cachedDomains(sv, d))._1
    }

  private def template(q: String): (SparkSession, String) => DataFrame =
    (s, d) =>
      Templates.maybeAnswer(q, SalesView(s, d))
        .getOrElse(sys.error(s"no template matched: $q"))._2

  /** Generic grain group-by from NL (K8 generic branch). */
  val q70IntentTrend = Q(
    "q70_intent_trend",
    compiled("What are the monthly sales trends by region?"),
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT CAST(date_trunc('month', date) AS DATE) AS period, region,
             $dsumSales AS value
      FROM sales_v GROUP BY 1, 2 ORDER BY period, region
    """),
  )

  /** Correlation intent (K8 correlation branch; ref D5). */
  val q71IntentCorr = Q(
    "q71_intent_corr",
    compiled("What is the correlation between transaction value and customer satisfaction?"),
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT round(corr(sales, satisfaction), 6) AS corr_coef FROM sales_v
    """),
  )

  /** Two-most-recent-quarters intent (K8 last2 branch; ref C3/F3). */
  val q72IntentLast2 = Q(
    "q72_intent_last2",
    compiled("What is the avg satisfaction by region for the two most recent quarters?"),
    Some(s"""
      WITH ${SalesView.sqlCte},
      q AS (
        SELECT DISTINCT CAST(date_trunc('quarter', date) AS DATE) AS period
        FROM sales_v ORDER BY period DESC LIMIT 2)
      SELECT CAST(date_trunc('quarter', date) AS DATE) AS period, region,
             $davgSat AS value
      FROM sales_v
      WHERE CAST(date_trunc('quarter', date) AS DATE) IN (SELECT period FROM q)
      GROUP BY 1, 2
      ORDER BY period DESC, region
    """),
  )

  /** QoQ delta intent with a bound region filter (K7+K8; ref C4). */
  val q73IntentQoq = Q(
    "q73_intent_qoq",
    compiled("How did sales change in the North region last quarter?"),
    Some(s"""
      WITH ${SalesView.sqlCte},
      base AS (
        SELECT CAST(date_trunc('quarter', date) AS DATE) AS qtr,
               $dsumSales AS val
        FROM sales_v WHERE region = 'North' GROUP BY 1),
      w AS (SELECT qtr, val, lag(val) OVER (ORDER BY qtr) AS prev FROM base)
      SELECT val AS current_qtr_value, prev AS prev_qtr_value,
             val - prev AS delta
      FROM w ORDER BY qtr DESC LIMIT 1
    """),
  )

  /** YoY-by-quarter intent (K8 YoY branch; ref C1 self left-join form). */
  val q74IntentYoy = Q(
    "q74_intent_yoy",
    compiled("Compare year-over-year sales performance by quarter."),
    Some(s"""
      WITH ${SalesView.sqlCte},
      agg AS (
        SELECT CAST(year(date) AS INT) AS year, CAST(quarter(date) AS INT) AS quarter,
               $dsumSales AS total
        FROM sales_v GROUP BY 1, 2)
      SELECT a.year, a.quarter, a.total, a.total - b.total AS yoy_delta
      FROM agg a LEFT JOIN agg b ON b.quarter = a.quarter AND b.year = a.year - 1
      ORDER BY a.year, a.quarter
    """),
  )

  /** Template fast-path: top products under 30 (K9; L3). */
  val q75TemplateTopProducts = Q(
    "q75_template_top_products",
    template("What are the top two products for customers under 30?"),
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT product, $dsumSales AS total_sales
      FROM sales_v WHERE age < 30
      GROUP BY product ORDER BY total_sales DESC, product LIMIT 2
    """),
  )

  /** Template fast-path: gender vs average satisfaction (K9; D2). */
  val q76TemplateGender = Q(
    "q76_template_gender",
    template("Are there any correlations between gender and average satisfaction?"),
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT gender, $davgSat AS avg_satisfaction
      FROM sales_v
      WHERE satisfaction IS NOT NULL AND gender IS NOT NULL
      GROUP BY gender ORDER BY avg_satisfaction DESC, gender
    """),
  )

  /** Template fast-path: region divergence (K9; L2 — regr_slope + HAVING). */
  val q77TemplateDivergence = Q(
    "q77_template_divergence",
    template("Which regions have growing sales but declining satisfaction?"),
    Some(s"""
      WITH ${SalesView.sqlCte},
      daily AS (
        SELECT region, date,
               $dsumSales AS sales_d,
               $davgSat AS sat_d
        FROM sales_v GROUP BY 1, 2),
      t AS (
        SELECT region, sales_d, sat_d,
               CAST(row_number() OVER (PARTITION BY region ORDER BY date) AS DOUBLE) AS t
        FROM daily),
      reg AS (
        SELECT region,
               round(regr_slope(sales_d, t), 6) AS slope_sales,
               round(regr_slope(sat_d, t), 6) AS slope_sat,
               count(*) AS n
        FROM t GROUP BY region)
      SELECT region, slope_sales, slope_sat, n FROM reg
      WHERE slope_sales > 0 AND slope_sat < 0
      ORDER BY slope_sales DESC, slope_sat ASC, region LIMIT 10
    """),
  )

  /** Template fast-path: satisfaction change in the North region last
    * quarter (K9; C2 broadcast bounds + B8 half-open ranges).
    */
  val q78TemplateSatChange = Q(
    "q78_template_sat_change",
    template("How did satisfaction change in the North region last quarter?"),
    Some(s"""
      WITH ${SalesView.sqlCte},
      mx AS (SELECT max(date) AS maxd FROM sales_v),
      b AS (SELECT CAST(date_trunc('quarter', maxd) AS DATE) AS q_curr,
                   CAST(date_trunc('quarter', maxd) - INTERVAL 3 MONTH AS DATE) AS q_prev
            FROM mx)
      SELECT 'North' AS region,
             CAST(SUM(CASE WHEN date >= q_prev AND date < q_curr
                           THEN CAST(satisfaction AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN date >= q_prev AND date < q_curr
                            THEN satisfaction END) AS avg_prev,
             CAST(SUM(CASE WHEN date >= q_curr AND date < CAST(q_curr + INTERVAL 3 MONTH AS DATE)
                           THEN CAST(satisfaction AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN date >= q_curr AND date < CAST(q_curr + INTERVAL 3 MONTH AS DATE)
                            THEN satisfaction END) AS avg_curr,
             CAST(SUM(CASE WHEN date >= q_curr AND date < CAST(q_curr + INTERVAL 3 MONTH AS DATE)
                           THEN CAST(satisfaction AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN date >= q_curr AND date < CAST(q_curr + INTERVAL 3 MONTH AS DATE)
                            THEN satisfaction END)
             - CAST(SUM(CASE WHEN date >= q_prev AND date < q_curr
                             THEN CAST(satisfaction AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN date >= q_prev AND date < q_curr
                            THEN satisfaction END) AS delta
      FROM sales_v, b WHERE lower(region) = 'north'
    """),
  )

  /** Template fast-path: avg satisfaction by region, two most recent
    * quarters (K9; L-family + F3).
    */
  val q79TemplateSatRegion2q = Q(
    "q79_template_sat_region_2q",
    template("Show the average satisfaction by region for the last two quarters."),
    Some(s"""
      WITH ${SalesView.sqlCte},
      q AS (
        SELECT DISTINCT CAST(date_trunc('quarter', date) AS DATE) AS quarter_start
        FROM sales_v ORDER BY quarter_start DESC LIMIT 2)
      SELECT CAST(date_trunc('quarter', date) AS DATE) AS quarter_start, region,
             $davgSat AS avg_sat
      FROM sales_v
      WHERE CAST(date_trunc('quarter', date) AS DATE) IN (SELECT quarter_start FROM q)
      GROUP BY 1, 2
      ORDER BY quarter_start DESC, region
    """),
  )

  val all: Seq[Q] = Seq(
    q70IntentTrend, q71IntentCorr, q72IntentLast2, q73IntentQoq, q74IntentYoy,
    q75TemplateTopProducts, q76TemplateGender, q77TemplateDivergence,
    q78TemplateSatChange, q79TemplateSatRegion2q,
  )
}
