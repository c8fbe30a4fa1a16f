package graft

import graft.operators.AsOf

/** asOfJoin semantics on crafted rows: inclusive match at equal ts, latest
  * prior wins, no-prior rows keep null payload, keys never cross.
  */
class AsOfSpec extends SparkSpec {

  test("asOfJoin: latest prior-or-equal right row per key; nulls when none") {
    import spark.implicits._
    val left = Seq(
      (101L, 1L, 1000L), // before any purchase → null
      (102L, 1L, 2000L), // equal ts to purchase 11 → inclusive match
      (103L, 1L, 5000L), // after purchases 11(2000) and 12(3000) → 12
      (104L, 2L, 9000L), // other key: only key-2 purchases visible
    ).toDF("event_id", "user_id", "tms")
    val right = Seq(
      (11L, 1L, 2000L),
      (12L, 1L, 3000L),
      (21L, 2L, 8000L),
    ).toDF("purchase_event_id", "user_id", "ptms")
    val got = AsOf.asOfJoin(left, right, "user_id", "tms", "ptms",
        Seq("purchase_event_id", "ptms"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap
    assert(got === Map(
      101L -> None,
      102L -> Some((11L, 2000L)),
      103L -> Some((12L, 3000L)),
      104L -> Some((21L, 8000L)),
    ))
  }

  test("asOfJoin plan: one shuffle on the key, no range join, no cartesian") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "tms")
    val right = Seq((2L, 1L, 5L)).toDF("purchase_event_id", "user_id", "ptms")
    val df = AsOf.asOfJoin(left, right, "user_id", "tms", "ptms",
      Seq("purchase_event_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin")) // it's a union+window, not a join
  }
}
