package graft.operators

import graft.core.Q
import graft.intent.SalesView
import graft.sources.CsvNormalizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** CSV ingestion round-trip queries (A1–A5): materialize the sales view as
  * a CSV (reference-style synonym headers / headerless), re-ingest through
  * CsvNormalizer, and oracle-check against the parquet-derived view — if
  * header matching, synonym binding, casts, or the positional fallback are
  * wrong, the round trip hash-mismatches.
  */
object CsvQueries {

  /** Keyed by applicationId (like q94's writer): two concurrent JVMs
    * (bench + correctness run) never race on one overwrite target, and a
    * regenerated /root/testdata can't serve a stale fixture. The dataset
    * segment is prefixed so it never starts with '_' (Spark's path filter
    * hides `_`/`.`-prefixed names), and the app's whole fixture tree is
    * deleted on JVM exit so repeated runs don't accumulate dirs.
    */
  private def fixtureDir(s: SparkSession, d: String, tag: String): String = {
    val appDir = graft.core.FixtureDirs.perApp(
      "/root/repo/target/csv_fixture", s.sparkContext.applicationId)
    s"$appDir/d${d.replaceAll("[^a-zA-Z0-9]", "_")}_$tag"
  }

  private def writeOnce(sv: DataFrame, path: String,
      headers: Option[Seq[String]]): Unit = {
    val flag = new java.io.File(path, "_SUCCESS")
    if (!flag.exists()) {
      val out = headers.map(h => sv.toDF(h: _*)).getOrElse(sv)
      out.write.mode("overwrite")
        .option("header", headers.isDefined.toString)
        .csv(path)
    }
  }

  /** A1+A3+§1.3 — header scan with synonym headers (Weekly_Sales, CSAT, …)
    * normalized and bound back to the contract.
    */
  val q84CsvRoundtrip = Q(
    "q84_csv_roundtrip",
    (s, d) => {
      val path = fixtureDir(s, d, "hdr")
      writeOnce(SalesView(s, d), path, Some(Seq(
        "Date", "Product", "Region", "Weekly_Sales",
        "Customer_Age", "Customer_Gender", "CSAT")))
      CsvNormalizer.load(s, path)
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT date, product, region, sales, age, gender, satisfaction
      FROM sales_v
    """),
  )

  /** A2 — headerless positional fallback: col0..col6 → contract. */
  val q85CsvHeaderless = Q(
    "q85_csv_headerless",
    (s, d) => {
      val path = fixtureDir(s, d, "nohdr")
      writeOnce(SalesView(s, d), path, None)
      CsvNormalizer.load(s, path)
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT date, product, region, sales, age, gender, satisfaction
      FROM sales_v
    """),
  )

  /** JSONL round-trip — the documents corpus materialized as line-
    * delimited JSON (the training-data interchange format) and re-ingested
    * through [[graft.sources.DocSources.jsonlDocs]] with an explicit
    * schema; the per-language aggregate oracle-checks against the parquet
    * originals, so writer encoding, line splitting, schema binding, and
    * type round-tripping are all on the hook.
    */
  val q96JsonlRoundtrip = Q(
    "q96_jsonl_roundtrip",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val path = fixtureDir(s, d, "jsonl")
      val docs = graft.core.Tables.documents(s, d)
      val flag = new java.io.File(path, "_SUCCESS")
      if (!flag.exists())
        docs.write.mode("overwrite").json(path)
      graft.sources.DocSources.jsonlDocs(s, path, docs.schema)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("first_doc"))
    },
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             min(doc_id) AS first_doc
      FROM documents GROUP BY lang
    """),
  )

  /** ORC round-trip — the sales view materialized as ORC (Spark's other
    * first-class columnar format) and re-read; the oracle checks against
    * the parquet originals, so writer encoding, ORC schema binding, and
    * type round-tripping (date/double/long) are all exercised. DuckDB
    * cannot read ORC, which is exactly why the oracle goes through the
    * parquet-derived view instead of the fixture.
    */
  val q109OrcRoundtrip = Q(
    "q109_orc_roundtrip",
    (s, d) => {
      val path = fixtureDir(s, d, "orc")
      val sv = SalesView(s, d)
      val flag = new java.io.File(path, "_SUCCESS")
      if (!flag.exists())
        sv.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(sv.columns.map(col): _*) // contract order, not file order
    },
    Some(s"""
      WITH ${SalesView.sqlCte}
      SELECT date, product, region, sales, age, gender, satisfaction
      FROM sales_v
    """),
  )

  val all: Seq[Q] =
    Seq(q84CsvRoundtrip, q85CsvHeaderless, q96JsonlRoundtrip, q109OrcRoundtrip)
}
