package graft.operators

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * right_ts <= left_ts on the same key (the time-series join Spark has no
  * native operator for; the builder brief's canonical custom-operator
  * case).
  *
  * Spark-first formulation: tag both sides, UNION, and forward-fill the
  * right payload with a `last(_, ignoreNulls)` window ordered by
  * (ts, side) — ONE shuffle on the key, each row touched once. The naive
  * alternative (equi-join on key with a range predicate, then max-reduce
  * per left row) materializes O(|L|·|R|/keys) candidates per key and dies
  * on hot keys at 100 TB; this never materializes candidates at all.
  * Right rows sort before left rows at equal timestamps, so the match is
  * inclusive (right_ts <= left_ts), exactly DuckDB's ASOF JOIN semantics
  * — which is what the q99 oracle runs. When the right side has several
  * rows at the same (key, ts), the greatest payload struct wins — a
  * deterministic contract rather than partition-order luck.
  */
object AsOf {

  /** @param payload right-side columns carried onto each left row (filled
    *                with the latest-as-of values, null when no prior right
    *                row exists)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pStruct = struct(payload.map(col): _*)
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(right.select(pStruct).schema.head.dataType).as("_p"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_l"),
      pStruct.as("_p"))
    // `_p` as the final sort key makes ties deterministic: among right
    // rows sharing (key, ts) the greatest payload struct wins, regardless
    // of partition/sort arrival order. Payload columns must therefore be
    // orderable types (no maps) — true for every atomic/array column.
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_fill", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(p => col(s"_fill.$p").as(p)): _*)
  }

  /** q99 — every click joined as-of to the user's latest prior (or
    * simultaneous) purchase. Right side is pre-reduced to one row per
    * (user, ts) — max event_id, mirroring the oracle — so ties are
    * deterministic in both engines. Output uses epoch millis for exact
    * cross-engine hashing.
    */
  val q99AsofJoin = Q(
    "q99_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("tms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_millis(col("ts")).as("ptms"))
        .agg(max(col("event_id")).as("purchase_event_id"))
      asOfJoin(clicks, purchases, "user_id", "tms", "ptms",
          Seq("purchase_event_id", "ptms"))
        .select(
          col("event_id"), col("user_id"), col("tms"),
          col("purchase_event_id"),
          (col("tms") - col("ptms")).as("ms_since_purchase"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, epoch_ms(ts) AS tms, event_type
        FROM events),
      clicks AS (
        SELECT event_id, user_id, tms FROM ev WHERE event_type = 'click'),
      purchases AS (
        SELECT user_id, tms AS ptms, max(event_id) AS purchase_event_id
        FROM ev WHERE event_type = 'purchase' GROUP BY user_id, tms)
      SELECT c.event_id, c.user_id, c.tms,
             p.purchase_event_id,
             c.tms - p.ptms AS ms_since_purchase
      FROM clicks c
      ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ptms <= c.tms
    """),
  )

  val all: Seq[Q] = Seq(q99AsofJoin)
}
