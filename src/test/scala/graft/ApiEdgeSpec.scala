package graft

import graft.api.{LlmPorts, ResultTable}
import graft.guard.SqlGuard
import graft.intent.SalesView

class ApiEdgeSpec extends SparkSpec {

  private lazy val sales = SalesView(spark, "/root/testdata/sf0.001")

  test("preview truncation caps rows via limit, not a full collect") {
    val t = ResultTable.preview(sales, maxRows = 8)
    assert(t.rows.length === 8)
    assert(t.headers === Seq("date", "product", "region", "sales", "age",
      "gender", "satisfaction"))
  }

  test("markdown render: header, separator, 8-row cap, null-safe cells") {
    val t = ResultTable(Seq("a", "b"),
      (1 to 12).map(i => Seq[Any](i, if (i == 2) null else s"v$i")))
    val md = t.toMarkdown()
    val lines = md.split("\n")
    assert(lines.length === 2 + 8)
    assert(lines(0) === "| a | b |")
    assert(lines(1) === "| --- | --- |")
    assert(lines(3) === "| 2 |  |")
  }

  test("inspect returns count, schema, and a 3-row sample") {
    val (n, schema, sample) = ResultTable.inspect(sales)
    assert(n === sales.count())
    assert(schema.take(2) === Seq("date" -> "date", "product" -> "string"))
    assert(sample.rows.length === 3)
  }

  test("saveAsTable sink round-trips through the catalog") {
    ResultTable.saveAsTable(sales.limit(10), "graft_sales_test")
    assert(spark.table("graft_sales_test").count() === 10)
    spark.sql("DROP TABLE graft_sales_test")
  }

  test("fake SqlGen output survives the full guardrail path") {
    sales.createOrReplaceTempView("sales")
    val raw = LlmPorts.fakeSqlGen("total sales by region", "schema...")
    val res = SqlGuard.runGuarded(spark, raw)
    assert(res.isRight, res.left.toOption.getOrElse(""))
    assert(res.toOption.get.columns.toSeq === Seq("region", "total"))
    assert(res.toOption.get.count() === 4)
  }

  test("table summarization goes through the chat port deterministically") {
    val t = ResultTable.preview(sales, 3)
    val s1 = LlmPorts.summarizeTable("what's here?", t)
    val s2 = LlmPorts.summarizeTable("what's here?", t)
    assert(s1 === s2)
    assert(s1.startsWith("[fake-llm]"))
  }
}
