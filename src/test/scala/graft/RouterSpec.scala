package graft

import graft.intent.Router
import org.scalatest.funsuite.AnyFunSuite

/** Route-fidelity corpus: the reference UI's 26 prompts
  * (`/root/reference/ui/prompts.txt`) with the route + precedence step the
  * reference's classifier produces for each (ground truth captured by
  * executing the reference logic on the corpus). Any divergence here means
  * our K2 port drifted.
  */
class RouterSpec extends AnyFunSuite {

  // (prompt, wantsData, reason-prefix)
  private val corpus: Seq[(String, Boolean, String)] = Seq(
    ("Which regions have growing sales but declining satisfaction?", true, "Schema"),
    ("What are the top two products for customers under 30?", true, "Schema"),
    ("How did satisfaction change in the North region last quarter?", true, "Schema"),
    ("What month showed the highest overall sales growth?", true, "Schema"),
    ("Are there any correlations between gender and average satisfaction?", true, "Schema"),
    ("How does customer satisfaction compare between each region based on age?", true, "Schema"),
    ("What positive trends are evident in each of the regions?", true, "Schema"),
    ("What are the monthly sales trends for each product over the entire time period? Identify any seasonal patterns or anomalies.", true, "Schema"),
    ("Which product-region combinations generate the highest revenue, and are there any underperforming combinations that need attention?", true, "Schema"),
    // NOTE: hyphenated "year-over-year" does NOT trip the YoY override in the
    // reference — it routes on schema terms instead. Quirk preserved.
    ("Compare year-over-year sales performance by quarter. Which periods showed the strongest growth or decline?", true, "Schema"),
    ("Analyze customer satisfaction scores across different age groups. Are there specific age segments that are consistently more or less satisfied?", true, "Schema"),
    ("What is the relationship between customer age and average purchase size? Are certain age demographics more valuable?", true, "Schema"),
    ("Compare purchasing patterns and satisfaction levels between male and female customers across different products and regions.", true, "Schema"),
    ("Rank all products by total revenue, average transaction size, and customer satisfaction. Which products are the best overall performers?", true, "Schema"),
    ("Identify products with high sales volume but low customer satisfaction scores. What might explain this discrepancy?", true, "Schema"),
    ("Which regions consistently outperform others in sales, and what factors might contribute to this success?", true, "Schema"),
    ("Are there regional differences in customer demographics or satisfaction levels that could inform targeted marketing strategies?", true, "Schema"),
    ("What is the correlation between transaction value and customer satisfaction? Do higher-value purchases lead to better satisfaction?", true, "Schema"),
    ("Identify the characteristics of transactions with satisfaction scores below 2.0. What patterns emerge regarding product, region, or customer demographics?", true, "Schema"),
    ("Which customer segments (by age, gender, and region) represent the greatest untapped opportunity for revenue growth?", true, "Schema"),
    ("Analyze the bottom 10% of sales transactions. What common factors contribute to these low-performing sales?", true, "Schema"),
    ("Based on historical patterns, what are the projected sales for the next quarter by product and region, and where should we allocate additional resources?", true, "Schema"),
    ("What are some of the domains that are accepting of time series analysis and predictions?", false, "No strong"),
    ("Summarize the key ideas from the Walmart PDF", false, "Explicit doc"),
    ("How can AI be a core component of value creation in a business model?", false, "No strong"),
    ("What does business intelligence refer to and what are it's ultimate goals?", false, "No strong"),
  )

  test("K2 classifier matches the reference on all 26 corpus prompts") {
    corpus.foreach { case (prompt, expectData, reasonPrefix) =>
      val (isData, reason) = Router.wantsData(prompt)
      assert(isData === expectData, s"route mismatch for: $prompt (reason: $reason)")
      assert(reason.startsWith(reasonPrefix),
        s"precedence step mismatch for: $prompt — got '$reason', want prefix '$reasonPrefix'")
    }
  }

  test("YoY override fires on unhyphenated spellings with quarter+sales") {
    assert(Router.wantsData("show yoy sales by quarter")._2.contains("YoY"))
    assert(Router.wantsData("year over year revenue per quarter")._2.contains("YoY"))
    // hyphenated spelling intentionally does not fire the override
    assert(!Router.wantsData("year-over-year sales by quarter")._2.contains("YoY"))
  }

  test("doc intent loses to numeric/sales cues (reference step 1)") {
    // 'report' is a doc hint, but 'sales'+'total' are analytic → data
    val (d1, _) = Router.wantsData("report the total sales by region")
    assert(d1)
    val (d2, r2) = Router.wantsData("summarize the whitepaper's section on architecture")
    assert(!d2 && r2.startsWith("Explicit doc"))
  }

  test("word-boundary matching avoids 'sum' inside 'summarize'") {
    // 'summarize' is a doc hint AND contains 'sum' — word-aware check must
    // not treat it as the numeric word 'sum'
    val (d, r) = Router.wantsData("summarize the findings")
    assert(!d, r)
  }

  test("empty question defaults to docs") {
    assert(!Router.wantsData("")._1)
    assert(!Router.wantsData("   ")._1)
  }

  test("K1 simple route: tabular wins, docs wins, tie prefers data") {
    assert(Router.decideSimple("average sales per region")._1 === Router.Data)
    assert(Router.decideSimple("explain the document")._1 === Router.Docs)
    // K1 quirk preserved from the reference: 'summarize' substring-matches
    // the tabular word 'sum', producing a tie → analytics default
    assert(Router.decideSimple("summarize the pdf")._1 === Router.Data)
    assert(Router.decideSimple("hello there")._1 === Router.Data) // tie-break
  }
}
