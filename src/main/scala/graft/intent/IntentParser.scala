package graft.intent

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Parsed analytic intent — ref K3–K7 (`/root/reference/api/main.py:362-423`).
  *
  * @param metric    "sales" | "satisfaction" | "" (caller defaults to sales)
  * @param dims      grouping dimensions in detection order
  * @param filters   dim -> bound value (from the runtime distinct domains)
  * @param timegrain "month" | "quarter" | "year" | ""
  * @param compare   (grain, kind) e.g. ("quarter","last2"), ("year","yoy")
  */
final case class Intent(
    metric: String,
    dims: Seq[String],
    filters: Map[String, String],
    timegrain: String,
    compare: (String, String),
)

object IntentParser {

  private val metricSat = Seq("satisfaction", "csat")
  private val metricSales =
    Seq("sales", "revenue", "transaction value", "transaction_value", "amount")
  private val analyticsWords =
    Seq("trend", "growth", "decline", "compare", "correlation", "change", "performance")

  val dimCandidates: Seq[String] = Seq("region", "product", "gender", "age")

  // phrase table first (insertion order), then keyword fallbacks
  // (`api/main.py:130-139`, `:379-387`)
  private val timeGrains = ListMap(
    "monthly" -> "month", "per month" -> "month", "by month" -> "month",
    "quarterly" -> "quarter", "per quarter" -> "quarter", "by quarter" -> "quarter",
    "yearly" -> "year", "annual" -> "year")

  // (`api/main.py:141-148`, `:389-393`)
  private val compareTokens = ListMap(
    "last quarter" -> ("quarter", "last"),
    "previous quarter" -> ("quarter", "previous"),
    "two most recent quarters" -> ("quarter", "last2"),
    "two latest quarters" -> ("quarter", "last2"),
    "yoy" -> ("year", "yoy"),
    "year-over-year" -> ("year", "yoy"))

  /** K3 — metric detection (`api/main.py:362-368`). */
  def findMetric(ql: String): String =
    if (metricSat.exists(ql.contains)) "satisfaction"
    else if (metricSales.exists(ql.contains)) "sales"
    else if (analyticsWords.exists(ql.contains)) "sales"
    else ""

  /** K5 — time-grain detection (`api/main.py:379-387`). */
  def detectTimegrain(ql: String): String =
    timeGrains.collectFirst { case (k, g) if ql.contains(k) => g }
      .getOrElse {
        if (ql.contains("quarter")) "quarter"
        else if (ql.contains("month")) "month"
        else if (ql.contains("year") || ql.contains("annual")) "year"
        else ""
      }

  /** K6 — comparison detection (`api/main.py:389-393`). */
  def detectCompare(ql: String): (String, String) =
    compareTokens.collectFirst { case (k, v) if ql.contains(k) => v }
      .getOrElse(("", ""))

  /** K7 — dimensions mentioned by name, filter values bound against runtime
    * distinct domains: multi-word substring containment first, then a
    * punctuation-stripped token match (`api/main.py:395-423`).
    */
  def detectDimsAndFilters(
      ql: String,
      domains: Map[String, Seq[String]]): (Seq[String], Map[String, String]) = {
    var dims = dimCandidates.filter(ql.contains).toVector
    var filters = Map.empty[String, String]
    val tokens = ql.split("\\s+").map(_.stripPrefix("\"").stripSuffix("\"")
      .replaceAll("[,.?!]+$", "").replaceAll("^[,.?!]+", "")).toSet
    for (d <- dimCandidates; vals <- domains.get(d)) {
      val contained = vals.find(v => ql.contains(v.toLowerCase))
      contained match {
        case Some(v) =>
          filters += (d -> v)
          if (!dims.contains(d)) dims :+= d
        case None =>
          if (!filters.contains(d)) {
            vals.find(v => tokens.contains(v.toLowerCase)).foreach { v =>
              filters += (d -> v)
              if (!dims.contains(d)) dims :+= d
            }
          }
      }
    }
    (dims, filters)
  }

  def parse(q: String, domains: Map[String, Seq[String]]): Intent = {
    val ql = q.toLowerCase
    val (dims, filters) = detectDimsAndFilters(ql, domains)
    Intent(
      metric = findMetric(ql),
      dims = dims,
      filters = filters,
      timegrain = detectTimegrain(ql),
      compare = detectCompare(ql))
  }

  /** D8 — runtime dimension-domain discovery with session-level caching
    * (`api/main.py:345-360`): SELECT DISTINCT per dimension, sorted
    * case-insensitively. Age is excluded from value binding here: its domain
    * is numeric and the reference's stringified ages only ever bind through
    * the token fallback, which template queries (e.g. "under 30") shadow.
    */
  def discoverDomains(sales: DataFrame): Map[String, Seq[String]] =
    Seq("region", "product", "gender").map { d =>
      val vals = sales.select(col(d)).where(col(d).isNotNull)
        .distinct().collect().map(_.get(0).toString.trim)
      d -> vals.distinct.sortBy(_.toLowerCase).toSeq
    }.toMap

  private val domainCache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Seq[String]]]

  def cachedDomains(sales: DataFrame, key: String): Map[String, Seq[String]] =
    domainCache.getOrElseUpdate(key, discoverDomains(sales))
}
