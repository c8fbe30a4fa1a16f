package graft.guard

/** Dialect sanitizer — ref H-san (`/root/reference/api/main.py:534-558`
  * rule table + `:580-626` function): rewrite common T-SQL/MySQL idioms an
  * LLM emits into the TARGET dialect. The reference targets DuckDB; here
  * the target is Spark SQL, so the right-hand sides differ where the
  * dialects do:
  *   - DATEADD(quarter,N,d) → months×3 interval arithmetic (same idea)
  *   - backticks are KEPT (legal identifier quoting in Spark, stripped for
  *     DuckDB by the reference)
  *   - everything else maps 1:1.
  * Rules are ordered and applied once each; the full rewrite is idempotent
  * (property-tested in GuardSpec).
  */
object DialectRewriter {

  private def dateaddRepl(unit: String, n: Int, expr: String): String = {
    val months = if (unit.toLowerCase.startsWith("quarter")) n * 3 else n
    if (unit.equalsIgnoreCase("day"))
      s"(CAST($expr AS DATE) + INTERVAL '$n' DAY)"
    else {
      val sign = if (months < 0) "-" else "+"
      s"(CAST($expr AS DATE) $sign INTERVAL '${math.abs(months)}' MONTH)"
    }
  }

  /** Apply all rewrite rules; `table` replaces a hallucinated `sales_data`
    * relation (`api/main.py:622-624`); `maxLimit` caps the TOP-n carry so
    * the rewrite can never raise the caller's defensive row bound
    * ([[SqlGuard.runGuarded]] passes its own limit through).
    */
  def apply(sql: String, table: String = "sales", maxLimit: Int = 200): String = {
    var s = sql
    // dates/time (`api/main.py:537-539`, `:597-601`)
    s = s.replaceAll("(?i)\\bGETDATE\\s*\\(\\s*\\)", "current_timestamp")
    s = s.replaceAll("(?i)\\bNOW\\s*\\(\\s*\\)", "current_timestamp")
    s = s.replaceAll("(?i)\\bCURRENT_TIMESTAMP\\s*\\(\\s*\\)", "current_timestamp")
    s = s.replaceAll("(?i)\\bcurrent_date\\s*\\(\\s*\\)", "current_date")
    // DATEADD(part, n, expr) (`api/main.py:541-543`, `:603-619`)
    val dateadd =
      "(?i)\\bDATEADD\\s*\\(\\s*'?(quarter|month|day)'?\\s*,\\s*(-?\\d+)\\s*,\\s*([^)]+?)\\s*\\)".r
    s = dateadd.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        dateaddRepl(m.group(1), m.group(2).toInt, m.group(3))))
    // SELECT TOP n → SELECT ... LIMIT min(n, maxLimit). The reference's
    // rule table comments "TOP N → LIMIT N" but its substitution drops N
    // entirely (`api/main.py:546`), leaving the row bound to the generic
    // ensure-limit default (200) — a top-5 request silently returning
    // 200 rows. We implement the reference's STATED intent, capped at the
    // caller's defensive bound so a huge TOP can't raise it (above the
    // cap the result is exactly the reference's: the injected default).
    // Only a TRAILING outer LIMIT suppresses the carry — an inner
    // subquery LIMIT must not reintroduce the dropped-N bug — and the
    // shared comment-safe append keeps the bound live past trailing `--`
    // comments. Inner/subquery TOPs still just drop, as in the reference.
    val top = "(?i)^(\\s*SELECT\\s+)TOP\\s+(\\d+)\\s".r
    top.findFirstMatchIn(s).foreach { m =>
      val raw = m.group(2)
      val n = if (raw.length > 9) maxLimit else math.min(raw.toInt, maxLimit)
      s = top.replaceFirstIn(s, java.util.regex.Matcher.quoteReplacement(m.group(1)))
      if (!SqlGuard.hasTrailingLimit(s)) s = SqlGuard.appendLimit(s, n)
    }
    s = s.replaceAll("(?i)SELECT\\s+TOP\\s+(\\d+)\\s", "SELECT ")
    s = s.replaceAll("(?i)\\bOFFSET\\s+0\\s+ROWS?\\b", "")
    // ISNULL/NVL → coalesce (`api/main.py:549`, `:555`)
    s = s.replaceAll("(?i)\\bISNULL\\s*\\(", "coalesce(")
    s = s.replaceAll("(?i)\\bNVL\\s*\\(", "coalesce(")
    // IIF(cond, a, b) → CASE WHEN (`api/main.py:551`)
    s = s.replaceAll("(?i)\\bIIF\\s*\\(([^,]+),\\s*([^,]+),\\s*([^)]+)\\)",
      "CASE WHEN $1 THEN $2 ELSE $3 END")
    // CONVERT(date, expr) → CAST (`api/main.py:553`)
    s = s.replaceAll("(?i)\\bCONVERT\\s*\\(\\s*date\\s*,\\s*([^)]+)\\)",
      "CAST($1 AS DATE)")
    // == / === → = (`api/main.py:557`)
    s = s.replaceAll("(?<![=!<>])==+(?!=)", "=")
    // hallucinated table name (`api/main.py:622-624`)
    if (table != "sales_data")
      s = s.replaceAll("(?i)\\bFROM\\s+sales_data\\b", s"FROM $table")
    s
  }
}
