package graft.api

import graft.guard.SqlGuard
import graft.intent.{IntentCompiler, IntentParser, Router, Templates}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ask-AI orchestration cascade — ref K13/K14
  * (`/root/reference/api/main.py:1301-1400`): route → template fast-path →
  * intent-compiled plan → guarded LLM-SQL → floor. A question routed to
  * data NEVER falls back to docs (reference invariant, `:1390-1400`).
  *
  * LLM SQL generation is a pluggable port (`sqlGen`) — the reference calls
  * Ollama (`api/main.py:771-840`); tests and the catalog use a
  * deterministic fake. Answer shaping (K13) reports the stage and data
  * source alongside the result plan.
  */
object AskAi {

  /** @param stage  "template" | "intent" | "llm-sql"
    * @param name   template name / intent reason / generated-sql marker
    */
  final case class Answer(stage: String, name: String, table: DataFrame,
      dataSources: Seq[String] = Seq("sales"))

  def answer(
      spark: SparkSession,
      q: String,
      sales: DataFrame,
      domains: Map[String, Seq[String]],
      sqlGen: Option[String => String] = None): Either[String, Answer] = {

    val (isData, reason) = Router.wantsData(q)
    if (!isData) return Left(s"routed to docs: $reason")

    // 1) template fast-path (K9)
    Templates.maybeAnswer(q, sales) match {
      case Some((name, plan)) => return Right(Answer("template", name, plan))
      case None               => ()
    }
    // 2) intent-compiled plan (K8) — reject trivially degenerate compiles
    try {
      val (plan, why) = IntentCompiler.compile(q, sales, domains)
      return Right(Answer("intent", why, plan))
    } catch { case _: Exception => () }
    // 3) guarded LLM-SQL (K10–K12). The guarded SQL references temp view
    // "sales" (DialectRewriter maps the reference's sales_data to it);
    // register THIS cascade's frame so the stage works in a fresh service
    // JVM — previously only the q82 catalog query ever registered the
    // view, leaving stage 3 structurally dead (or reading a stale frame)
    // in a standalone Serve process.
    sqlGen.foreach { gen =>
      sales.createOrReplaceTempView("sales")
      SqlGuard.runGuarded(spark, gen(q)) match {
        case Right(df) => return Right(Answer("llm-sql", "generated", df))
        case Left(_)   => ()
      }
    }
    // 4) floor — never fall back to docs from the data route
    Left("no confident answer from the data engine")
  }

  /** Convenience: discover domains from the sales frame (cached upstream
    * when called through the catalog).
    */
  def answerWithDiscovery(spark: SparkSession, q: String, sales: DataFrame,
      sqlGen: Option[String => String] = None): Either[String, Answer] =
    answer(spark, q, sales, IntentParser.discoverDomains(sales), sqlGen)
}
