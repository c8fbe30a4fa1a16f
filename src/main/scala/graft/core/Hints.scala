package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Statistics-gated broadcast hints (VERDICT r9 #1).
  *
  * An explicit `broadcast()` is NEVER demoted by AQE: at a scale where the
  * hinted side outgrows the broadcast ceiling the query hard-fails (driver
  * OOM / relation-size error) instead of degrading to a shuffle join. So a
  * hint on any SF-scaling table (customer, supplier, orders, …) must be
  * derived from statistics, not forced — the q13 / q45-saltFor stance.
  *
  * The gate measures the RAW SCAN's optimizer estimate (file-size bytes,
  * no job), not the derived frame's: without CBO, Catalyst's default join
  * statistics multiply child sizes, so a joined frame's estimate is
  * meaninglessly inflated while a scan's is the honest compressed size.
  * The cap defaults to 512 MB — a quarter of the 8 GB / 512M-row broadcast
  * ceiling, leaving headroom for decompression fan-out — and is
  * conf-overridable (`graft.dim.broadcast.capBytes`) so plan-shape tests
  * can plant an over-threshold dimension and assert the hint disappears.
  */
object Hints {

  val CapConf = "graft.dim.broadcast.capBytes"
  val DefaultCapBytes: Long = 512L << 20

  /** True while `measuredScan`'s optimizer size estimate is under the cap —
    * the raw gate for callers that need to pick a whole PLAN SHAPE (not just
    * drop a hint) when a derived frame stops being dimension-sized (q132's
    * map-side scoring vs co-partitioned join).
    */
  def isDimSized(measuredScan: DataFrame): Boolean = {
    val cap = BigInt(measuredScan.sparkSession.conf
      .get(CapConf, DefaultCapBytes.toString).toLong)
    measuredScan.queryExecution.optimizedPlan.stats.sizeInBytes <= cap
  }

  /** `broadcast(hinted)` only while `measuredScan`'s size estimate is
    * dimension-sized; past the cap, `hinted` unchanged — the join shuffles
    * on its keys (or AQE still broadcasts it if the RUNTIME size allows,
    * which, unlike the static hint, is a decision AQE can revisit).
    */
  def broadcastIfDimSized(hinted: DataFrame, measuredScan: DataFrame): DataFrame =
    if (isDimSized(measuredScan)) broadcast(hinted) else hinted
}
