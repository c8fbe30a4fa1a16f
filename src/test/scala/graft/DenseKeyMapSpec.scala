package graft

import graft.core.DenseKeyMap
import org.apache.spark.sql.functions.col

/** Unit behavior of the dense-domain dimension map (core/DenseKeyMap):
  * lookup semantics (hit / gap / out-of-range / null), equi-join
  * equivalence on a gappy domain, and both scale gates.
  */
class DenseKeyMapSpec extends SparkSpec {

  import spark.implicits._

  test("lookup matches the equi-join on a gappy key domain") {
    val dim = Seq((10L, 1), (12L, 3), (15L, 0), (1000L, 7))
      .toDF("k", "c")
    val m = DenseKeyMap.build(dim, "k", "c")
    assert(m.nonEmpty, "tiny dense domain must build")
    val probes = (8L to 17L).toDF("k")
    val got = probes.select(col("k"), m.get.code(col("k")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    val viaJoin = probes.join(dim, Seq("k"), "left")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(got == viaJoin, s"dense lookup diverged from the join: $got vs $viaJoin")
    // out-of-range key below the domain floor: null, not a crash
    assert(Seq(3L).toDF("k").select(m.get.code(col("k"))).head().isNullAt(0))
  }

  test("null keys and null codes are skipped, like an equi-join would") {
    val dim = Seq(
      (java.lang.Long.valueOf(5L), java.lang.Integer.valueOf(2)),
      (null.asInstanceOf[java.lang.Long], java.lang.Integer.valueOf(9)),
      (java.lang.Long.valueOf(7L), null.asInstanceOf[java.lang.Integer]))
      .toDF("k", "c")
    val m = DenseKeyMap.build(dim, "k", "c").get
    val out = Seq(5L, 7L).toDF("k").select(m.code(col("k"))).collect()
    assert(out(0).getInt(0) == 2)
    assert(out(1).isNullAt(0), "null-code key must read as unmapped")
  }

  test("both scale gates close: key range over cap, and oversized pairs stats") {
    // gate 2: domain range (999991) exceeds a planted 1 KB cap
    val wide = Seq((0L, 1), (999990L, 2)).toDF("k", "c")
    spark.conf.set(DenseKeyMap.CapConf, "1024")
    try {
      assert(DenseKeyMap.build(wide, "k", "c").isEmpty,
        "range gate ignored the cap")
      // gate 1: a frame whose size ESTIMATE alone exceeds 16× the cap is
      // refused before any collect job (Range reports honest 8 B/row)
      val big = spark.range(1L << 20)
        .selectExpr("id AS k", "CAST(id % 20 AS INT) AS c")
      assert(DenseKeyMap.build(big, "k", "c").isEmpty,
        "stats gate let an over-cap collect start")
    } finally spark.conf.unset(DenseKeyMap.CapConf)
    // default cap: the same million-key dense domain builds fine
    val big = spark.range(100000L)
      .selectExpr("id AS k", "CAST(id % 20 AS INT) AS c")
    val m = DenseKeyMap.build(big, "k", "c")
    assert(m.nonEmpty)
    val probe = Seq(0L, 19L, 99999L).toDF("k")
      .select(m.get.code(col("k"))).collect().map(_.getInt(0))
    assert(probe.sameElements(Array(0, 19, 99999 % 20)))
  }

  test("measuredScan overrides gate 1's estimate for joined pairs frames") {
    // a joined pairs frame carries Catalyst's multiplied join estimate —
    // gate 1 must refuse it blind, and accept it when the caller vouches
    // with the honest raw-scan measurement (the q13 dimension-chain case)
    val dim = spark.range(1000L).selectExpr("id AS k", "CAST(id % 3 AS INT) AS g")
    val codes = Seq((0, 10), (1, 11), (2, 12)).toDF("g", "c")
    val joined = dim.join(codes, "g").select(col("k"), col("c"))
    // plant a cap that the multiplied join estimate exceeds but the raw
    // dim estimate (8 B/row) and key range (1000 ≤ cap) do not
    val est = joined.queryExecution.optimizedPlan.stats.sizeInBytes
    spark.conf.set(DenseKeyMap.CapConf, "10000")
    try {
      assert(est > BigInt(16) * 10000,
        s"test premise broken: join estimate $est under the planted gate")
      assert(DenseKeyMap.build(joined, "k", "c").isEmpty,
        "gate 1 trusted a multiplied join estimate")
      val m = DenseKeyMap.build(joined, "k", "c", measuredScan = Some(dim))
      assert(m.nonEmpty, "measuredScan did not open gate 1")
      assert(Seq(7L).toDF("k").select(m.get.code(col("k")))
        .head().getInt(0) == 11)
    } finally spark.conf.unset(DenseKeyMap.CapConf)
  }
}
