package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** The z-order layout property, asserted mechanically: for a query boxed
  * in the SECOND dimension, a z-clustered layout confines matching rows to
  * a small subset of files, while a first-dimension sort scatters them
  * across (nearly) all files — the file-level pruning win min/max stats
  * deliver at 100 TB.
  */
class LayoutSpec extends SparkSpec {

  test("zKey interleaves bits (known values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (65535L, 65535L)).toDF("x", "y")
    val got = df.select(Layout.zKey(col("x"), col("y"))).collect().map(_.getLong(0))
    // morton(5=101b, 3=011b) = x bits at even positions, y at odd:
    // x:1_0_1 -> 010001b(17? compute: bit0=1->1, bit2 of x(=1)->pos4=16 => 17)
    // y:011b -> bit0=1->pos1=2, bit1=1->pos3=8 => 10; total 27
    assert(got.toSeq === Seq(0L, 1L, 2L, 3L, 27L, (1L << 32) - 1))
  }

  test("2-d box query touches fewer files under z-order than 1-d sort") {
    val n = 1 << 16
    val df = spark.range(n.toLong).select(
      (col("id") % 256).as("x"),
      (col("id") / 256).cast("long").as("y"),
      col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val nFiles = 32
    Layout.zOrderWrite(df, col("x"), col("y"), s"$base/zorder", nFiles)
    df.repartitionByRange(nFiles, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/xsort")
    // box narrow in y, wide in x — the case a pure x-sort cannot prune
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 10 && col("y") < 14)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(s"$base/zorder")
    val xFiles = filesTouched(s"$base/xsort")
    assert(xFiles >= nFiles * 3 / 4, s"x-sort should scatter y: $xFiles")
    assert(zFiles * 2 <= xFiles,
      s"z-order must confine the box to fewer files: z=$zFiles x=$xFiles")
    // content survives the layout write unchanged
    val a = spark.read.parquet(s"$base/zorder").agg(sum("payload")).head.getLong(0)
    assert(a === df.agg(sum("payload")).head.getLong(0))
  }
}
