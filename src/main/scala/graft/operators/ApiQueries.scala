package graft.operators

import graft.api.{AskAi, Rag}
import graft.core.{Q, Tables}
import graft.guard.SqlGuard
import graft.intent.{IntentParser, SalesView}
import org.apache.spark.sql.functions._

/** Catalog entries for the API layer: the Ask-AI cascade (K13/K14), the
  * guarded LLM-SQL path (K10–K12), and RAG retrieval (J2/J4/J5) — all
  * driver-visible and oracle-checked.
  */
object ApiQueries {

  private val dsumSales = "CAST(SUM(CAST(sales AS DECIMAL(18,2))) AS DOUBLE)"

  /** K14 stage 1: a question whose keywords hit a template fast-path. */
  val q80AskaiTemplate = Q(
    "q80_askai_template",
    (s, d) => {
      val sv = SalesView(s, d)
      AskAi.answer(s, "What are the top two products for customers under 30?",
          sv, IntentParser.cachedDomains(sv, d))
        .fold(sys.error, a => { require(a.stage == "template", a.stage); a.table })
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT product, $dsumSales AS total_sales
      FROM sales_v WHERE age < 30
      GROUP BY product ORDER BY total_sales DESC, product LIMIT 2
    """),
  )

  /** K14 stage 2: no template matches → the intent compiler answers. */
  val q81AskaiIntent = Q(
    "q81_askai_intent",
    (s, d) => {
      val sv = SalesView(s, d)
      AskAi.answer(s, "Show monthly sales trends by region.",
          sv, IntentParser.cachedDomains(sv, d))
        .fold(sys.error, a => { require(a.stage == "intent", a.stage); a.table })
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT CAST(date_trunc('month', date) AS DATE) AS period, region,
             $dsumSales AS value
      FROM sales_v GROUP BY 1, 2 ORDER BY period, region
    """),
  )

  /** K10–K12: a deterministic "LLM" emits T-SQL-flavored SQL; the guard
    * clamps, rewrites to Spark dialect, validates, injects LIMIT, executes.
    */
  val q82GuardedLlmSql = Q(
    "q82_guarded_llm_sql",
    (s, d) => {
      SalesView(s, d).createOrReplaceTempView("sales")
      val fakeLlmOutput =
        """Here is the SQL you asked for:
          |SELECT TOP 5 region,
          |  CAST(SUM(CAST(sales AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM sales_data
          |WHERE region == 'North' OR region == 'South'
          |GROUP BY region ORDER BY total DESC""".stripMargin
      SqlGuard.runGuarded(s, fakeLlmOutput).fold(sys.error, identity)
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT region, $dsumSales AS total
      FROM sales_v WHERE region = 'North' OR region = 'South'
      GROUP BY region ORDER BY total DESC
    """),
  )

  /** J2/J4 — RAG retrieval: deterministic hash-embedded query, exact cosine
    * top-5 against the embeddings table, joined to documents for source
    * attribution. The oracle receives the query vector as a literal (the
    * embedder runs engine-side only for corpus-scale work).
    */
  val q83RagTopk = Q(
    "q83_rag_topk",
    (s, d) => {
      val qv = Rag.hashEmbedder("spark join performance tuning")
      Rag.topK(Tables.embeddings(s, d), qv, 5)
        .join(Tables.documents(s, d), col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("source"), col("sim"))
    },
    Some {
      val qv = Rag.hashEmbedder("spark join performance tuning")
      val lit = qv.map(v => s"CAST(${v.toDouble} AS DOUBLE)").mkString("[", ", ", "]")
      s"""
      WITH q AS (SELECT $lit AS qe),
      dim AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS dd),
      cos AS (
        SELECT e.vec_id,
               round(SUM(CAST(e.embedding[dd] AS DOUBLE) * qe[dd])
                 / (sqrt(SUM(CAST(e.embedding[dd] AS DOUBLE)**2))
                  * sqrt(SUM(qe[dd]**2))), 6) AS sim
        FROM embeddings e, q CROSS JOIN dim
        GROUP BY e.vec_id),
      top AS (SELECT vec_id, sim FROM cos ORDER BY sim DESC, vec_id LIMIT 5)
      SELECT t.vec_id, d.source, t.sim
      FROM top t JOIN documents d ON d.doc_id = t.vec_id
      """
    },
  )

  val all: Seq[Q] = Seq(q80AskaiTemplate, q81AskaiIntent, q82GuardedLlmSql, q83RagTopk)
}
