package graft

import graft.intent.{IntentCompiler, IntentParser, SalesView, Templates}

/** Parser (K3–K7) and compiler (K8) behavior on the reference's own intent
  * semantics, including the quirks worth pinning down.
  */
class IntentSpec extends SparkSpec {

  private val domains = Map(
    "region" -> Seq("East", "North", "South", "West"),
    "product" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
    "gender" -> Seq("Female", "Male"))

  test("metric detection: satisfaction > sales > analytics-default > none") {
    assert(IntentParser.findMetric("average satisfaction by region") === "satisfaction")
    assert(IntentParser.findMetric("total revenue per month") === "sales")
    assert(IntentParser.findMetric("what is the trend here") === "sales")
    assert(IntentParser.findMetric("hello world") === "")
  }

  test("timegrain: phrase table first, then keyword fallback, default empty") {
    assert(IntentParser.detectTimegrain("monthly sales") === "month")
    assert(IntentParser.detectTimegrain("sales by quarter") === "quarter")
    assert(IntentParser.detectTimegrain("annual totals") === "year")
    assert(IntentParser.detectTimegrain("sales in the last quarter") === "quarter")
    assert(IntentParser.detectTimegrain("sales overall") === "")
  }

  test("compare tokens: last/previous/last2/yoy") {
    assert(IntentParser.detectCompare("sales last quarter") === (("quarter", "last")))
    assert(IntentParser.detectCompare("two most recent quarters") === (("quarter", "last2")))
    assert(IntentParser.detectCompare("yoy growth") === (("year", "yoy")))
    assert(IntentParser.detectCompare("nothing here") === (("", "")))
  }

  test("dims: substring mention binding (incl. the reference's 'average'⊃'age' quirk)") {
    val (dims1, _) = IntentParser.detectDimsAndFilters("sales by region", domains)
    assert(dims1 === Seq("region"))
    // 'average' contains 'age' — the reference's substring check binds the
    // age dim; we preserve that behavior
    val (dims2, _) = IntentParser.detectDimsAndFilters("average sales by region", domains)
    assert(dims2.contains("age") && dims2.contains("region"))
  }

  test("filter binding: domain value by containment, dim auto-added") {
    val (dims, filters) =
      IntentParser.detectDimsAndFilters("how did sales do in the north last quarter", domains)
    assert(filters === Map("region" -> "North"))
    assert(dims.contains("region"))
  }

  test("compiler: QoQ branch ignores dims, applies filters, emits 3 columns") {
    val sales = SalesView(spark, "/root/testdata/sf0.001")
    val (plan, reason) = IntentCompiler.compile(
      "How did sales change in the North region last quarter?", sales, domains)
    assert(reason.contains("quarter-over-quarter"))
    assert(plan.columns.toSeq ===
      Seq("current_qtr_value", "prev_qtr_value", "delta"))
    val row = plan.head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1) - row.getDouble(2)) < 1e-9)
  }

  test("compiler: generic branch groups by requested grain and dims") {
    val sales = SalesView(spark, "/root/testdata/sf0.001")
    val (plan, reason) = IntentCompiler.compile(
      "What are the monthly sales trends by region?", sales, domains)
    assert(reason.startsWith("sum(sales) by month"))
    assert(plan.columns.toSeq === Seq("period", "region", "value"))
    // groups are (month, region): 4 regions per month
    val months = plan.collect().map(_.getDate(0)).distinct
    assert(plan.count() <= months.length * 4L)
  }

  test("template dispatcher: first-match precedence mirrors the reference") {
    val sales = SalesView(spark, "/root/testdata/sf0.001")
    // contains gender AND satisfaction AND 'north'+'last quarter' → the
    // region-last-quarter template wins (checked first)
    val hit = Templates.maybeAnswer(
      "satisfaction last quarter in the north by gender", sales)
    assert(hit.exists(_._1 === "satisfaction_change_region_last_quarter"))
    val miss = Templates.maybeAnswer("tell me something nice", sales)
    assert(miss.isEmpty)
  }
}
