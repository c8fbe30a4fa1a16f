package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic-equivalence check for q159's in-array SCD2 closure
  * (`ScalePatterns.scd2Closed`): on a RANDOMIZED keyed change log —
  * variable version counts, duplicate priorities within a key (the case
  * that makes n_keys != n), shared priorities across keys — the
  * shuffle-free array closure must produce the identical rollup as the
  * naive rows + lead-window + countDistinct formulation it replaced.
  * Seeded generator keeps the suite deterministic.
  */
class Scd2ShapeSpec extends SparkSpec {

  test("q159 core: in-array closure == rows + lead window + countDistinct") {
    import spark.implicits._
    val rnd = new scala.util.Random(159)
    val prios = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    // (key, Seq(version -> (priority, valid_from))) — version-sorted by
    // construction, 1..4 versions, ~1/3 of consecutive versions repeat
    // the SAME priority so first-occurrence marking is exercised
    val logs = (1L to 3000L).map { k =>
      val n = 1 + rnd.nextInt(4)
      var p = prios(rnd.nextInt(prios.length))
      val vs = (0 until n).map { v =>
        if (v > 0 && rnd.nextInt(3) != 0) p = prios(rnd.nextInt(prios.length))
        (v, p, java.sql.Date.valueOf(java.time.LocalDate
          .of(1995, 1, 1).plusDays(rnd.nextInt(2000))))
      }
      (k, vs)
    }
    val rows = logs.flatMap { case (k, vs) =>
      vs.map { case (v, p, d) => (k, v, p, d) }
    }.toDF("k", "version", "p", "vf")

    // naive reference: rows -> key-partitioned lead window -> Expand agg
    val w = Window.partitionBy("k").orderBy("version")
    val naive = rows
      .withColumn("vt", lead(col("vf"), 1).over(w))
      .groupBy(col("p").as("o_orderpriority"),
        col("vt").isNull.as("is_current"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("k")).as("n_keys"),
        max(datediff(col("vt"), col("vf"))).as("max_span_days"))

    // production: the same log as version-sorted arrays through the
    // in-array closure (sort_array orders struct comparison by the
    // leading version field, matching the window's ORDER BY version)
    val prod = rows
      .groupBy("k")
      .agg(sort_array(collect_list(
        struct(col("version"), col("p"), col("vf")))).as("vs"))
      .select(explode(graft.operators.ScalePatterns.scd2Closed(col("vs"))).as("e"))
      .groupBy(col("e.p").as("o_orderpriority"),
        col("e.ic").as("is_current"))
      .agg(count(lit(1)).as("n"),
        sum(col("e.ko")).as("n_keys"),
        max(col("e.span")).as("max_span_days"))

    val key = Seq("o_orderpriority", "is_current")
    assert(naive.orderBy(key.map(col): _*).collect().toSeq ==
      prod.orderBy(key.map(col): _*).collect().toSeq)
  }
}
