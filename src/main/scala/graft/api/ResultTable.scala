package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result shaping at the API edge — refs F8/J7/L7/K13
  * (`/root/reference/api/main.py:302-307`, `:995-1002`, `:645-662`,
  * `:1234-1269`).
  */
final case class ResultTable(headers: Seq[String], rows: Seq[Seq[Any]]) {

  /** J7 prep — markdown render capped at `maxRows` (reference default 8,
    * `api/main.py:995-1002`).
    */
  def toMarkdown(maxRows: Int = 8): String = {
    val head = s"| ${headers.mkString(" | ")} |"
    val sep = s"| ${headers.map(_ => "---").mkString(" | ")} |"
    val body = rows.take(maxRows).map(r =>
      s"| ${r.map(v => Option(v).map(_.toString).getOrElse("")).mkString(" | ")} |")
    (head +: sep +: body).mkString("\n")
  }
}

object ResultTable {

  /** F8 — preview truncation: collect at most `maxRows` through a limit
    * (never a full collect; `api/main.py:653`, `:995`).
    */
  def preview(df: DataFrame, maxRows: Int = 8): ResultTable =
    ResultTable(
      df.columns.toSeq,
      df.limit(maxRows).collect().map(_.toSeq).toSeq)

  /** L7 — `/data/inspect` shape: row count, schema, 3 sample rows
    * (`api/main.py:645-662`).
    */
  def inspect(df: DataFrame): (Long, Seq[(String, String)], ResultTable) =
    (df.count(),
      df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq,
      preview(df, 3))

  /** A7 — table sink: persist a frame as a managed table
    * (`etl/run.py:27-35`'s CREATE OR REPLACE TABLE).
    */
  def saveAsTable(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(name)
}
