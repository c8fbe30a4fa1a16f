package graft

import graft.api.AskAi
import graft.functions.GraftExtensions
import graft.intent.SalesView

/** End-to-end golden corpus: each reference UI prompt
  * (`/root/reference/ui/prompts.txt`) through the full cascade, asserting
  * the answering stage and template/branch, plus SQL access to the native
  * functions via the extension hook.
  */
class CorpusSpec extends SparkSpec {

  private lazy val sales = SalesView(spark, "/root/testdata/sf0.001")
  private val domains = Map(
    "region" -> Seq("East", "North", "South", "West"),
    "product" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
    "gender" -> Seq("Female", "Male"))

  // (prompt, expected stage, expected name fragment)
  private val corpus: Seq[(String, String, String)] = Seq(
    ("Which regions have growing sales but declining satisfaction?",
      "template", "regions_growth_vs_csat"),
    ("What are the top two products for customers under 30?",
      "template", "top_products_under_30"),
    ("How did satisfaction change in the North region last quarter?",
      "template", "satisfaction_change_region_last_quarter"),
    ("What month showed the highest overall sales growth?",
      "template", "month_highest_growth"),
    ("Are there any correlations between gender and average satisfaction?",
      "template", "gender_vs_avg_satisfaction"),
    // no template keywords → intent compiler, generic monthly group-by
    ("What are the monthly sales trends for each product over the entire time period? Identify any seasonal patterns or anomalies.",
      "intent", "sum(sales) by month"),
    // YoY phrasing compiles through the YoY-by-quarter branch
    ("Compare year-over-year sales performance by quarter. Which periods showed the strongest growth or decline?",
      "intent", "year-over-year by quarter"),
    ("What is the correlation between transaction value and customer satisfaction? Do higher-value purchases lead to better satisfaction?",
      "intent", "correlation"),
  )

  test("cascade picks the reference's answering path for each corpus prompt") {
    corpus.foreach { case (prompt, stage, frag) =>
      AskAi.answer(spark, prompt, sales, domains) match {
        case Right(a) =>
          assert(a.stage === stage, s"stage for: $prompt (got ${a.stage}/${a.name})")
          assert(a.name.contains(frag), s"branch for: $prompt (got ${a.name})")
          assert(a.table.columns.nonEmpty)
        case Left(why) => fail(s"no answer for: $prompt ($why)")
      }
    }
  }

  test("docs prompts are refused by the data cascade with the route reason") {
    Seq(
      "Summarize the key ideas from the Walmart PDF",
      "How can AI be a core component of value creation in a business model?",
    ).foreach { p =>
      val r = AskAi.answer(spark, p, sales, domains)
      assert(r.isLeft && r.left.exists(_.startsWith("routed to docs")), p)
    }
  }

  test("native functions are SQL-accessible through the extension hook") {
    GraftExtensions.register(spark)
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("emb_ext_test")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_ext_test LIMIT 5")
    assert(self.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val sh = spark.sql(
      "SELECT simhash16(array('hello', 'world')) AS h").head().getString(0)
    assert(sh.matches("[01]{16}"))
    // gram_keys: 3 words -> one 3-gram; equals the composed md5-prefix key
    val gk = spark.sql(
      "SELECT gram_keys(array('a', 'b', 'c'), 3) AS g").head().getSeq[Long](0)
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('a b c'), 1, 15), 16, 10) AS BIGINT)")
      .head().getLong(0)
    assert(gk === Seq(expected))
    val tfs = spark.sql(
      "SELECT token_freq_stats(array('x', 'x', 'y')) AS t").head().getStruct(0)
    assert((tfs.getLong(0), tfs.getLong(1), tfs.getLong(2)) === ((3L, 2L, 2L)))
    val tfm = spark.sql(
      "SELECT token_freq_map(array('x', 'x', 'y')) AS m").head()
      .getMap[String, Long](0)
    assert(tfm === Map("x" -> 2L, "y" -> 1L))
  }
}
