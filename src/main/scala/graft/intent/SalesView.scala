package graft.intent

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's normalized 7-column sales contract
  * (`/root/reference/api/main.py:181-218`, `data_dictionary.md`):
  * date DATE, product TEXT, region TEXT, sales DOUBLE, age INT,
  * gender TEXT, satisfaction DOUBLE.
  *
  * The driver testdata has no such table, so the view is derived
  * deterministically from `orders` — every mapping is a pure column
  * expression reproducible in the DuckDB oracle (see [[sqlCte]]). This is
  * the substrate for the intent front-end's catalog queries: the NL layer
  * compiles against this schema exactly as the reference compiles against
  * its CSV-backed view.
  */
object SalesView {

  def apply(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderdate").cast("date").as("date"),
      col("o_orderpriority").as("product"),
      when(col("o_custkey") % 4 === 0, "North")
        .when(col("o_custkey") % 4 === 1, "South")
        .when(col("o_custkey") % 4 === 2, "East")
        .otherwise("West").as("region"),
      col("o_totalprice").as("sales"),
      (col("o_custkey") % 60 + 18).cast("int").as("age"),
      when(col("o_orderkey") % 2 === 0, "Male").otherwise("Female").as("gender"),
      (col("o_orderkey") % 50).cast("double")./(10.0).as("satisfaction"))

  /** DuckDB CTE computing the identical view from the orders parquet. */
  val sqlCte: String =
    """sales_v AS (
      SELECT CAST(o_orderdate AS DATE) AS date,
             o_orderpriority AS product,
             CASE CAST(o_custkey % 4 AS INT)
               WHEN 0 THEN 'North' WHEN 1 THEN 'South'
               WHEN 2 THEN 'East' ELSE 'West' END AS region,
             o_totalprice AS sales,
             CAST(o_custkey % 60 + 18 AS INT) AS age,
             CASE WHEN o_orderkey % 2 = 0 THEN 'Male' ELSE 'Female' END AS gender,
             CAST(o_orderkey % 50 AS DOUBLE) / 10.0 AS satisfaction
      FROM orders)"""
}
