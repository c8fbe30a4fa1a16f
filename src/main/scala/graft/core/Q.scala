package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query in the engine's catalog: a Spark plan builder plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query used
  * by the driver's differential correctness gate (column names and output
  * types must match the Spark result exactly).
  */
final case class Q(
    name: String,
    plan: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)
