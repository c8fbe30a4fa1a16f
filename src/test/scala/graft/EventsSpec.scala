package graft

import graft.operators.Events

/** Invariant tests for the batch event-analytics operators (their exact
  * values are oracle-checked; these pin the semantic contracts the oracle
  * cannot express as invariants).
  */
class EventsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q150: day-0 retention is exactly 1.0 for every cohort") {
    val rows = Events.q150CohortRetention.plan(spark, dir).collect()
    val day0 = rows.filter(_.getInt(1) == 0)
    assert(day0.nonEmpty)
    day0.foreach { r =>
      assert(r.getLong(2) === r.getLong(3), s"offset-0 active != cohort: $r")
      assert(r.getDouble(4) === 1.0)
    }
    // retention never exceeds 1 and cohort sizes sum to the user count
    rows.foreach(r => assert(r.getDouble(4) <= 1.0, r.toString))
    val users = graft.core.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(day0.map(_.getLong(3)).sum === users)
  }

  test("q151: transition probabilities sum to 1 per prev_type") {
    val rows = Events.q151EventTransitions.plan(spark, dir).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      // each p is rounded to 6 decimals; k terms drift at most k*5e-7
      assert(math.abs(pSum - 1.0) < 1e-5, s"$prev sums to $pSum")
    }
    // total transitions = events - one seam per user
    val e = graft.core.Tables.events(spark, dir)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }
}
