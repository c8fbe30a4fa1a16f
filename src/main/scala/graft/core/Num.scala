package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine deterministic numeric aggregation.
  *
  * Distributed double sums are order-dependent, so a Spark partial-aggregate
  * sum of ~600k doubles can differ from a single-node engine (the DuckDB
  * oracle) in the low bits — enough to break hash comparison after rounding.
  * Money-like columns in the testdata carry exactly 2 decimals, so we sum
  * through exact DECIMAL(18,2) arithmetic (associative, order-independent,
  * identical in any engine) and cast the exact result to double at the end.
  * Intrinsically-float statistics (corr, regr_slope) are rounded to 6 places
  * instead; their cross-engine drift is ~1e-12 relative.
  *
  * Scale note: decimal hash aggregation stays inside whole-stage codegen and
  * map-side partial aggregation; the cost over a double sum is a constant
  * factor, not a shuffle.
  */
object Num {
  /** Exact carrier for 2-decimal money columns. */
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact carrier for small fractions (discount/tax, 2 decimals). */
  val Frac: DecimalType = DecimalType(10, 4)

  /** Order-independent SUM of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** AVG via exact decimal sum / count — mirrors the oracle's
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/count(x)` shape exactly.
    */
  def davg(c: Column): Column = sum(c.cast(Money)).cast(DoubleType) / count(c)

  /** TPC-H style discounted revenue, exact decimal: price * (1 - discount).
    * DECIMAL(18,2) * DECIMAL(11,4) = DECIMAL(30,6) — no precision loss.
    */
  def revenue(price: Column, discount: Column): Column =
    price.cast(Money) * (lit(1).cast(Frac) - discount.cast(Frac))

  /** Matching oracle-SQL fragments (DuckDB dialect). */
  val sqlDsum: String => String =
    c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  val sqlDavg: String => String =
    c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)/count($c)"
  val sqlRevenue: (String, String) => String = (p, disc) =>
    s"CAST($p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(10,4)) - CAST($disc AS DECIMAL(10,4)))"
}
