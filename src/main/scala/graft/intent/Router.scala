package graft.intent

import java.util.regex.Pattern

/** NL routing — ref K1 (`/root/reference/api/main.py:59-68`) and K2
  * (`api/main.py:237-282`): decide whether a question is answered from the
  * tabular engine ("data") or the document/RAG path ("docs").
  *
  * The 6-step precedence, word sets, word-boundary vs substring matching
  * quirks, and the YoY-by-quarter override are replicated exactly — route
  * decisions on the reference's own prompt corpus are the fidelity test
  * (RouterSpec).
  */
object Router {

  sealed trait Route { def name: String }
  case object Data extends Route { val name = "data" }
  case object Docs extends Route { val name = "docs" }

  // K1 word sets (`api/main.py:124-125`); substring matching.
  private val docWords = Seq(
    "pdf", "document", "doc", "summarize", "explain",
    "from the walmart pdf", "whitepaper", "paper")
  private val tabularWords = Seq(
    "csv", "table", "quarter", "region", "avg", "average", "sum",
    "trend", "growth", "satisfaction", "sales")

  /** K1 — simple keyword route; tie breaks to the tabular engine. */
  def decideSimple(q: String): (Route, String) = {
    val ql = q.toLowerCase.trim
    val docHit = docWords.exists(ql.contains)
    val tabHit = tabularWords.exists(ql.contains)
    if (tabHit && !docHit) (Data, "tabular/metrics keywords detected")
    else if (docHit && !tabHit) (Docs, "document/summary keywords detected")
    else (Data, "tie-break -> analytics default")
  }

  // K2 word sets (`api/main.py:96-123`, `:1210-1231`).
  private val schemaColumns = Seq(
    "date", "region", "product", "age", "gender", "sales", "satisfaction")
  private val numericWords = Seq(
    "sum", "avg", "average", "median", "min", "max", "total",
    "top", "rank", "trend", "increase", "decrease", "growth", "decline",
    "yoy", "mom", "qoq", "quarter", "month", "weekly", "highest", "lowest",
    "compare", "correlation", "corr", "distribution", "bucket", "percentile",
    "quartile", "std", "variance")
  private val numericPhrases = Seq(
    "y/y", "m/m", "q/q", "by region", "by product", "by age", "by gender",
    "segment", "breakdown")
  private val salesWords = Seq(
    "sales", "revenue", "txn", "transaction", "customers", "customer",
    "satisfaction", "nps", "age", "gender", "region", "product")
  private val salesPhrases = Seq("transaction value")
  private val docHints = Seq(
    "pdf", "document", "doc", "paper", "report", "whitepaper",
    "page ", "section ", "figure ", "table ",
    "summarize", "summary", "key ideas", "key takeaways",
    "according to", "from the pdf", "cite", "citation")
  private val biPatterns = Seq(
    "\\b(top|best|worst)\\b",
    "\\b(change|delta|difference|improvement|decline)\\b",
    "\\b(project|forecast|estimate|predict)\\b").map(_.r)

  /** Whole-word match (`_any_word`, `api/main.py:1210-1212`). */
  private[intent] def anyWord(q: String, words: Seq[String]): Boolean =
    words.exists(w =>
      Pattern.compile("\\b" + Pattern.quote(w) + "\\b").matcher(q).find())

  /** YoY-by-quarter override (`api/main.py:172-177`). Note: the hyphenated
    * spelling "year-over-year" intentionally does NOT match — reference
    * behavior, verified against its corpus.
    */
  private[intent] def hasYoyQuarter(q: String): Boolean = {
    val ql = q.toLowerCase
    val yoy = ql.contains("year over year") || ql.contains("yoy") ||
      ql.contains("y-o-y") || ql.contains("y/y")
    val qtr = ql.contains("quarter") ||
      Seq("q1", "q2", "q3", "q4", "quarterly").exists(ql.contains)
    val sales = Seq("sales", "revenue", "amount", "transaction value").exists(ql.contains)
    yoy && qtr && sales
  }

  /** K2 — the 6-step precedence classifier. Returns (route, reason). */
  def wantsData(q: String): (Boolean, String) = {
    if (q == null || q.trim.isEmpty) return (false, "Empty question; default to docs.")
    val ql = q.toLowerCase.trim

    // 1) Doc intent wins unless it ALSO clearly asks for numeric/sales analysis
    if (docHints.exists(ql.contains)) {
      val hasNumeric = anyWord(ql, numericWords) || numericPhrases.exists(ql.contains)
      val hasSales = anyWord(ql, salesWords) || salesPhrases.exists(ql.contains)
      if (!(hasNumeric || hasSales)) return (false, "Explicit doc intent detected.")
    }
    // YoY-by-quarter: always data
    if (hasYoyQuarter(ql)) return (true, "Detected YoY-by-quarter sales intent")
    // 2) Schema terms
    val schemaHits = schemaColumns.filter(ql.contains).sorted
    if (schemaHits.nonEmpty)
      return (true, s"Schema terms detected: ${schemaHits.mkString(", ")}")
    // 3) Numeric cues
    if (anyWord(ql, numericWords) || numericPhrases.exists(ql.contains))
      return (true, "Numeric/analytic cues suggest table aggregation.")
    // 4) Sales-domain terms
    if (anyWord(ql, salesWords) || salesPhrases.exists(ql.contains))
      return (true, "Sales-domain terms suggest tabular source.")
    // 5) BI phrasing
    biPatterns.find(_.findFirstIn(ql).isDefined) match {
      case Some(p) => return (true, s"BI pattern matched: ${p.pattern}")
      case None    => ()
    }
    // 6) Default to docs
    (false, "No strong tabular/analytic cues; route to docs.")
  }

  def routeFor(q: String): Route = if (wantsData(q)._1) Data else Docs
}
