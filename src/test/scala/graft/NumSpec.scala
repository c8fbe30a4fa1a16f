package graft

import org.apache.spark.sql.functions._
import graft.functions.DecimalSum128

/** Edge-case armor for the 128-bit long-backed decimal sum
  * (functions/DecimalSum128, VERDICT r8 #5). The catalog proves it on real
  * money columns; these tests force the paths the catalog never hits —
  * low-limb wraparound carries, negative totals, nulls, empty groups —
  * against a BigDecimal reference computed independently.
  */
class NumSpec extends SparkSpec {

  private def sum128(values: Seq[java.lang.Long], scale: Int): Option[BigDecimal] = {
    import spark.implicits._
    val df = values.map(Option(_).map(Long2long)).toDF("v")
    val r = df.agg(DecimalSum128.sumUnscaled(col("v"), scale).as("s")).head()
    if (r.isNullAt(0)) None else Some(r.getDecimal(0))
  }

  test("wraparound carries: sums past 2^63 are exact") {
    // 40 × (Long.MaxValue/2): low limb wraps ~10 times; a carry bug would
    // be off by a multiple of 2^64
    val vs = Seq.fill(40)(java.lang.Long.valueOf(Long.MaxValue / 2))
    val expect = BigDecimal(Long.MaxValue / 2) * 40 / BigDecimal(100)
    assert(sum128(vs, 2).contains(expect.setScale(2)))
  }

  test("negative totals and sign-extension into the high limb") {
    val vs = Seq(-Long.MaxValue, -Long.MaxValue, 7L, -1L)
      .map(java.lang.Long.valueOf)
    val expect =
      (BigDecimal(Long.MaxValue) * -2 + 7 - 1) / BigDecimal(1000000)
    assert(sum128(vs, 6).contains(expect.setScale(6)))
    // a mixed-sign walk that crosses zero repeatedly
    val walk = (1 to 1000).map(i => java.lang.Long.valueOf(
      if (i % 2 == 0) i.toLong * 1000001 else -i.toLong * 1000000))
    val ref = walk.map(v => BigInt(v.longValue())).sum
    assert(sum128(walk, 2).contains(BigDecimal(ref, 2)))
  }

  test("nulls are skipped; all-null and empty groups return NULL like sum") {
    assert(sum128(Seq(java.lang.Long.valueOf(100L), null,
      java.lang.Long.valueOf(-250L)), 2).contains(BigDecimal("-1.50")))
    assert(sum128(Seq(null, null), 2).isEmpty)
    assert(sum128(Seq.empty, 2).isEmpty)
  }

  test("partitioning-invariant: 1 vs 32 slices give identical totals") {
    import spark.implicits._
    val vs = (1 to 50000).map(i => (i % 97).toLong * 7919 - 400000)
    val expect = BigDecimal(vs.map(BigInt(_)).sum, 2)
    for (parts <- Seq(1, 32)) {
      val got = vs.toDF("v").repartition(parts)
        .agg(DecimalSum128.sumUnscaled(col("v"), 2)).head().getDecimal(0)
      assert(BigDecimal(got) == expect, s"parts=$parts")
    }
  }

  test("dsum/rsum match the plain decimal-sum formulation bit-for-bit") {
    import spark.implicits._
    val rows = (1 to 2000).map { i =>
      (i * 1.37 % 1000, (i % 11) * 0.01)
    }
    val df = rows.toDF("price", "disc")
    val fast = df.agg(
      graft.core.Num.dsum(col("price")).as("d"),
      graft.core.Num.rsum(col("price"), col("disc")).as("r")).head()
    val slow = df.agg(
      sum(col("price").cast(graft.core.Num.Money)).cast("double").as("d"),
      sum(graft.core.Num.revenue(col("price"), col("disc")))
        .cast("double").as("r")).head()
    assert(fast.getDouble(0) == slow.getDouble(0))
    assert(fast.getDouble(1) == slow.getDouble(1))
  }

  test("rsum survives prices whose 64-bit product would overflow") {
    import spark.implicits._
    // unscaled 9e17 cents (= 9e15 money units, legal DECIMAL(18,2)) times
    // the 10^4-scale multiplier ≈ 8.6e21 ≫ 2^63: the previous plain-long
    // product wrapped (legacy) or threw (ANSI); the widened multiply must
    // give the exact total the BigDecimal formulation does
    val big = 9.0e15
    val df = Seq((big, 0.05), (big, 0.00), (big, 0.10)).toDF("price", "disc")
    val fast = df.agg(
      graft.core.Num.rsum(col("price"), col("disc")).as("r")).head().getDouble(0)
    val slow = df.agg(
      sum(graft.core.Num.revenue(col("price"), col("disc")))
        .cast("double").as("r")).head().getDouble(0)
    assert(fast == slow, s"fast=$fast slow=$slow")
    assert(fast > 2.5e16) // sanity: far past the 2^63-unscaled wrap point
  }
}
