package graft

import graft.guard.{DialectRewriter, SqlGuard}
import graft.intent.SalesView

/** Table-driven coverage of every sanitizer rule (acceptance + rejection),
  * guard gate behavior, LIMIT-injection idempotence, and an end-to-end
  * guarded execution through spark.sql.
  */
class GuardSpec extends SparkSpec {

  // one case per rewrite rule (`api/main.py:535-558`)
  private val rewriteCases: Seq[(String, String)] = Seq(
    "SELECT GETDATE()" -> "SELECT current_timestamp",
    "SELECT NOW() AS t" -> "SELECT current_timestamp AS t",
    "SELECT CURRENT_TIMESTAMP() AS t" -> "SELECT current_timestamp AS t",
    "SELECT current_date() AS d" -> "SELECT current_date AS d",
    "SELECT DATEADD(quarter, 1, d) FROM t" ->
      "SELECT (CAST(d AS DATE) + INTERVAL '3' MONTH) FROM t",
    "SELECT DATEADD(month, -2, d) FROM t" ->
      "SELECT (CAST(d AS DATE) - INTERVAL '2' MONTH) FROM t",
    "SELECT DATEADD(day, 7, d) FROM t" ->
      "SELECT (CAST(d AS DATE) + INTERVAL '7' DAY) FROM t",
    // TOP carries its count into a LIMIT — the reference's rule table
    // STATES "TOP N -> LIMIT N" but its substitution drops N
    // (api/main.py:546); we implement the stated intent (appended on its
    // own line so a trailing -- comment can't swallow it)
    "SELECT TOP 5 x FROM t" -> "SELECT x FROM t\nLIMIT 5",
    "SELECT x FROM t OFFSET 0 ROWS" -> "SELECT x FROM t ",
    "SELECT ISNULL(a, b) FROM t" -> "SELECT coalesce(a, b) FROM t",
    "SELECT NVL(a, b) FROM t" -> "SELECT coalesce(a, b) FROM t",
    "SELECT IIF(a > 1, 'x', 'y') FROM t" ->
      "SELECT CASE WHEN a > 1 THEN 'x' ELSE 'y' END FROM t",
    "SELECT CONVERT(date, x) FROM t" -> "SELECT CAST(x AS DATE) FROM t",
    "SELECT * FROM t WHERE a == 1" -> "SELECT * FROM t WHERE a = 1",
    "SELECT * FROM sales_data" -> "SELECT * FROM sales",
  )

  test("each dialect rewrite rule fires (and only where it should)") {
    rewriteCases.foreach { case (in, want) =>
      assert(DialectRewriter(in) === want, s"input: $in")
    }
    // non-matches must pass through untouched
    val clean = "SELECT a, coalesce(b, 0) FROM sales WHERE a = 1 LIMIT 5"
    assert(DialectRewriter(clean) === clean)
    // backticks are legal Spark identifier quoting — preserved, unlike DuckDB
    assert(DialectRewriter("SELECT `a b` FROM t") === "SELECT `a b` FROM t")
  }

  test("rewrite is idempotent on every rule-triggering input") {
    rewriteCases.map(_._1).foreach { sql =>
      val once = DialectRewriter(sql)
      assert(DialectRewriter(once) === once, s"not idempotent on: $sql")
    }
  }

  test("safety gate: accepts SELECT, rejects DML/DDL and chained comments") {
    assert(SqlGuard.isSafeSelect("SELECT 1")._1)
    assert(SqlGuard.isSafeSelect("  select a from t")._1)
    Seq(
      "INSERT INTO t VALUES (1)",
      "DROP TABLE t",
      "SELECT 1; -- sneaky",
      "SELECT * FROM t WHERE x IN (SELECT 1); DELETE FROM t",
      "UPDATE t SET a = 1",
      "CREATE TABLE x AS SELECT 1",
      "ATTACH 'foo.db'",
      "COPY t TO 'f.csv'",
    ).foreach { sql =>
      assert(!SqlGuard.isSafeSelect(sql)._1, s"should reject: $sql")
    }
  }

  test("clamp keeps the last statement's trailing SELECT") {
    assert(SqlGuard.clampToSelect("DROP TABLE x; SELECT a FROM t")
      === Some("SELECT a FROM t"))
    assert(SqlGuard.clampToSelect("explanation text... SELECT a FROM t")
      === Some("SELECT a FROM t"))
    assert(SqlGuard.clampToSelect("no sql here") === None)
    assert(SqlGuard.clampToSelect("") === None)
    // prose containing the word "with" + parens must NOT be mistaken for a
    // CTE prefix — the bare SELECT is extracted like the reference
    assert(SqlGuard.clampToSelect(
      "I can help with that (sales by region): SELECT region FROM sales_data")
      === Some("SELECT region FROM sales_data"))
    // a real CTE shape IS retained (from WITH) so the ^SELECT gate rejects
    // it — the documented fail-closed divergence
    val cte = SqlGuard.clampToSelect(
      "Sure: WITH t AS (SELECT 1 AS x) SELECT x FROM t").get
    assert(cte.toUpperCase.startsWith("WITH"))
    assert(!SqlGuard.isSafeSelect(cte)._1)
  }

  test("LIMIT injection: adds when absent, idempotent, respects existing") {
    assert(SqlGuard.ensureLimit("SELECT a FROM t") === "SELECT a FROM t\nLIMIT 200")
    assert(SqlGuard.ensureLimit("SELECT a FROM t LIMIT 5") === "SELECT a FROM t LIMIT 5")
    Seq("SELECT a FROM t", "SELECT a FROM t LIMIT 3", "SELECT a FROM t;")
      .foreach { sql =>
        val once = SqlGuard.ensureLimit(sql)
        assert(SqlGuard.ensureLimit(once) === once, s"not idempotent on: $sql")
      }
    // the injected LIMIT must stay LIVE past a trailing line comment (a
    // same-line append would be commented out and the query unbounded)
    val commented = SqlGuard.ensureLimit("SELECT a FROM t -- top rows")
    assert(commented.linesIterator.toSeq.last === "LIMIT 200")
    // and a LIMIT that exists ONLY inside a comment must not suppress the
    // real injection
    assert(SqlGuard.ensureLimit("SELECT a FROM t -- LIMIT 5")
      .linesIterator.toSeq.last === "LIMIT 200")
  }

  test("TOP-n carry: capped by the guard bound, subquery/comment safe") {
    // a huge TOP cannot raise the defensive cap — above it the behavior is
    // exactly the reference's (the injected default)
    assert(DialectRewriter("SELECT TOP 5000 x FROM t").endsWith("LIMIT 200"))
    assert(DialectRewriter("SELECT TOP 99999999999999999999 x FROM t")
      .endsWith("LIMIT 200"))
    assert(DialectRewriter("SELECT TOP 5000 x FROM t", maxLimit = 10)
      .endsWith("LIMIT 10"))
    // an inner subquery LIMIT must not suppress the outer carry (that
    // would reintroduce the reference's dropped-N bug)
    val sub = DialectRewriter("SELECT TOP 5 x FROM (SELECT y AS x FROM t LIMIT 1000) q")
    assert(sub.endsWith("LIMIT 5"), sub)
    // a trailing outer LIMIT wins over the carry
    assert(DialectRewriter("SELECT TOP 5 x FROM t LIMIT 3")
      === "SELECT x FROM t LIMIT 3")
    // the carried LIMIT stays live past a trailing line comment
    val c = DialectRewriter("SELECT TOP 5 x FROM t -- top five")
    assert(c.linesIterator.toSeq.last === "LIMIT 5", c)
  }

  test("parser validation rejects commands that slip past regexes") {
    // 'analyze' isn't in the forbidden-token list but parses to a command
    val (ok, why) = SqlGuard.parsesAsQuery(spark, "ANALYZE TABLE t COMPUTE STATISTICS")
    assert(!ok, why)
    assert(SqlGuard.parsesAsQuery(spark, "SELECT 1")._1)
    assert(!SqlGuard.parsesAsQuery(spark, "SELECT 1 +")._1)
    // note: "SELECT FROM WHERE" PARSES in Spark (keywords are non-reserved,
    // so FROM becomes a column aliased WHERE) — syntax validation alone
    // can't reject it; analysis at execution time does
    assert(SqlGuard.parsesAsQuery(spark, "SELECT FROM WHERE")._1)
  }

  test("end-to-end guarded execution of LLM-ish T-SQL against the sales view") {
    SalesView(spark, "/root/testdata/sf0.001").createOrReplaceTempView("sales")
    val llmSql =
      """Here is your query:
        |SELECT TOP 3 region, SUM(sales) AS total
        |FROM sales_data WHERE region == 'North'
        |GROUP BY region""".stripMargin
    val res = SqlGuard.runGuarded(spark, llmSql)
    assert(res.isRight, res.left.toOption.getOrElse(""))
    val df = res.toOption.get
    assert(df.columns.toSeq === Seq("region", "total"))
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getString(0) === "North")
    // TOP 3's own count becomes the limit, so ensureLimit leaves it alone
    assert(SqlGuard.ensureLimit(DialectRewriter(SqlGuard.clampToSelect(llmSql).get))
      .contains("LIMIT 3"))
    val rejected = SqlGuard.runGuarded(spark, "DELETE FROM sales")
    assert(rejected.isLeft)
  }
}
