package graft.guard

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-SQL guardrail layer — refs K10–K12, H-san, F7
  * (`/root/reference/api/main.py:119-123`, `:287-300`, `:534-626`).
  *
  * The reference sanitizes LLM-generated SQL into the DuckDB dialect and
  * gates it behind a SELECT-only check before execution; here the target
  * dialect is Spark SQL and execution is `spark.sql`, with an extra
  * parser-level validation the reference can't do (reject anything whose
  * parsed logical plan is a command rather than a query).
  */
object SqlGuard {

  // K11 — `api/main.py:119-123`
  private val SafeSelect = "(?is)^\\s*select\\b".r
  private val ForbiddenPatterns: Seq[String] = Seq(
    "(?i)\\b(insert|update|delete|drop|alter|truncate|create|attach|detach|copy|load)\\b",
    ";\\s*--",
  )

  /** SELECT-only + forbidden-token gate (`api/main.py:287-294`). */
  def isSafeSelect(sql: String): (Boolean, String) = {
    val s = Option(sql).getOrElse("").trim
    if (SafeSelect.findFirstIn(s).isEmpty)
      return (false, "Only SELECT statements are allowed.")
    ForbiddenPatterns.find(p => p.r.findFirstIn(s).isDefined) match {
      case Some(p) => (false, s"Forbidden token matched: $p")
      case None    => (true, "OK")
    }
  }

  /** Multi-statement clamp: keep the last statement and extract its trailing
    * SELECT — `api/main.py:560-578`. ONE deliberate divergence: the
    * reference's regex strips a leading WITH clause and executes the bare
    * SELECT (`_SELECT_ONLY_RE` captures only group 1) — when a CTE name
    * shadows a real table that silently answers from the WRONG relation.
    * Here CTE-SHAPED input (`WITH <ident> AS (`) is retained from the WITH
    * keyword, so it flows to [[isSafeSelect]]'s ^SELECT gate and is
    * REJECTED — fail closed (the cascade's floor) instead of
    * wrong-but-plausible. The shape test requires the `AS (` so LLM prose
    * that merely contains the word "with" ("I can help with that (sales
    * by region): SELECT ...") still extracts the trailing bare SELECT
    * exactly like the reference.
    */
  def clampToSelect(sql: String): Option[String] = {
    if (sql == null || sql.trim.isEmpty) return None
    var cand = sql.trim
    if (cand.contains(";")) {
      val last = cand.split(";").map(_.trim).filter(_.nonEmpty)
      cand = if (last.nonEmpty) last.last else cand
    }
    extractSelect(cand).orElse {
      sql.split(";\\s*").reverseIterator.flatMap(extractSelect).nextOption()
    }
  }

  private val CteShape = "(?is)\\bwith\\s+[\\w`\"]+\\s+as\\s*\\(.*$".r
  private val TrailingSelect = "(?is)(select\\s+.+)$".r

  private def extractSelect(cand: String): Option[String] =
    CteShape.findFirstIn(cand).map(_.trim)
      .orElse(TrailingSelect.findFirstMatchIn(cand).map(_.group(1).trim))

  /** LIMIT detection + append shared by [[ensureLimit]] and the
    * DialectRewriter TOP-n carry. Detection ignores line comments (a
    * commented `-- LIMIT 5` must not suppress the real row bound) and the
    * append goes on its OWN LINE so a trailing line comment can never
    * swallow the injected LIMIT. Worst adversarial case — a `--` inside a
    * string literal hiding a real LIMIT from detection — appends a second
    * LIMIT, which is a parse error: the guard fails CLOSED, never
    * unbounded.
    */
  private[guard] def hasLimit(sql: String): Boolean =
    "(?i)\\blimit\\s+\\d+\\b".r
      .findFirstIn(sql.replaceAll("--[^\\n]*", "")).isDefined

  /** True only when an (uncommented) LIMIT ends the query — an inner
    * subquery LIMIT must NOT count as the outer row bound.
    */
  private[guard] def hasTrailingLimit(sql: String): Boolean =
    "(?is)\\blimit\\s+\\d+\\s*;?\\s*$".r
      .findFirstIn(sql.replaceAll("--[^\\n]*", "")).isDefined

  private[guard] def appendLimit(sql: String, n: Int): String =
    s"${sql.stripTrailing.stripSuffix(";").stripTrailing}\nLIMIT $n"

  /** F7 — defensive LIMIT injection (`api/main.py:296-300`); idempotent.
    * Detection stays whole-string like the reference ("if the query
    * already has a LIMIT, leave it"), but comment-stripped and
    * newline-appended via the shared helpers above.
    */
  def ensureLimit(sql: String, limit: Int = 200): String =
    if (hasLimit(sql)) sql else appendLimit(sql, limit)

  /** Spark-side extra validation: the parsed plan must be a plain query.
    * `spark.sql.parser` throws on syntax errors; command plans (DDL/DML
    * that slipped past the regex) are rejected by node name.
    */
  def parsesAsQuery(spark: SparkSession, sql: String): (Boolean, String) =
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(sql)
      plan match {
        case _: org.apache.spark.sql.catalyst.plans.logical.Command =>
          (false, s"Parsed to non-query plan: ${plan.getClass.getSimpleName}")
        case _ => (true, "OK")
      }
    } catch {
      case e: Exception =>
        // getMessage can be null (internal NPEs) or empty — the error path
        // must never itself throw out of the Left-based contract
        val msg = Option(e.getMessage)
          .flatMap(_.linesIterator.find(_.nonEmpty))
          .getOrElse(e.getClass.getSimpleName)
        (false, s"Parse error: $msg")
    }

  /** K12 — full guarded execution: clamp → dialect rewrite → safety gate →
    * parse check → LIMIT → `spark.sql`, with one retry (`api/main.py:309-329`).
    * Returns Left(reason) when rejected.
    */
  def runGuarded(spark: SparkSession, rawSql: String,
      table: String = "sales", limit: Int = 200): Either[String, DataFrame] = {
    clampToSelect(rawSql) match {
      case None => Left("No SELECT statement found.")
      case Some(clamped) =>
        val rewritten = DialectRewriter(clamped, table, limit)
        val (safe, why) = isSafeSelect(rewritten)
        if (!safe) Left(why)
        else {
          val (parses, pwhy) = parsesAsQuery(spark, rewritten)
          if (!parses) Left(pwhy)
          else {
            val finalSql = ensureLimit(rewritten, limit)
            try Right(spark.sql(finalSql))
            catch {
              case _: Exception =>
                // one guided retry (`api/main.py:309-329`); the comment is
                // inert but mirrors the reference's logged hint
                try Right(spark.sql(s"$finalSql\n-- RETRY: prefer date_trunc/INTERVAL"))
                catch { case e2: Exception => Left(s"Execution failed: ${e2.getMessage}") }
            }
          }
        }
    }
  }
}
