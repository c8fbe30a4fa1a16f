package graft.operators

import graft.core.{Num, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the scan-pruning lever at 100 TB: a multi-
  * dimensional clustering key (Morton / Z-order) interleaves the bits of
  * two bucket coordinates so rows close in BOTH dimensions land in the
  * same files, and parquet min/max stats prune 2-d box queries that a
  * single-column sort can only prune along its one axis.
  */
object Layout {

  /** 32-bit Morton key from two 16-bit coordinates: bit b of x lands at
    * position 2b, bit b of y at 2b+1. A static 16-term fold of shift/mask
    * arithmetic — whole-stage-codegen'd, no UDF.
    */
  def zKey(x: Column, y: Column): Column = {
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until 16).map { b =>
      (shiftright(xl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(yl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` clustered by the z-key of (x, y): range-partition on the
    * key (balanced files, globally ordered ranges), sort within
    * partitions, drop the key column on write. `nFiles` controls layout
    * granularity — at 100 TB this is thousands of files whose (x, y)
    * min/max boxes tile the plane.
    */
  def zOrderWrite(df: DataFrame, x: Column, y: Column, path: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zKey(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** q119 — the z-key math itself, oracle-checked: per-row Morton keys
    * over (ship-day, partkey) buckets, aggregated per key prefix. The
    * oracle recomputes the interleave with SQL bit arithmetic over a
    * 16-position grid, so a single misplaced bit shifts rows across
    * buckets and fails the hash.
    */
  val q119ZorderKey = Q(
    "q119_zorder_key",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val x = datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1970-01-01"))) % 65536
      val y = col("l_partkey") % 65536
      li.select(zKey(x, y).as("zkey"), col("l_quantity"))
        .groupBy(shiftright(col("zkey"), 20).as("z_bucket"))
        .agg(
          count(lit(1)).as("n"),
          Num.dsum(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""
      WITH base AS (
        -- rid: the synthetic lineitem is NOT unique on (orderkey,
        -- linenumber); each ROW needs its own z-key, so number them
        SELECT ROW_NUMBER() OVER () AS rid,
               datediff('day', DATE '1970-01-01', l_shipdate) % 65536 AS x,
               l_partkey % 65536 AS y, l_quantity
        FROM lineitem),
      g AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS b),
      terms AS (
        SELECT rid, l_quantity,
               ((x >> b) & 1) * (CAST(1 AS BIGINT) << CAST(2*b AS INT))
             + ((y >> b) & 1) * (CAST(1 AS BIGINT) << CAST(2*b+1 AS INT)) AS term
        FROM base CROSS JOIN g),
      z AS (
        SELECT rid, CAST(SUM(term) AS BIGINT) AS zkey,
               min(l_quantity) AS l_quantity -- one row per rid: min = value
        FROM terms GROUP BY rid)
      SELECT zkey >> 20 AS z_bucket, count(*) AS n,
             ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM z GROUP BY 1
    """),
  )

  /** Small-file compaction — the OPTIMIZE half of table maintenance (the
    * z-order writer above is the CLUSTER half). Streaming ingest leaves
    * thousands of tiny files; at 100 TB an uncompacted table turns every
    * scan into a file-listing + task-scheduling storm. The operator: list
    * the fragmented layout's size (a METADATA operation — no data read),
    * size the target layout at `targetBytes` per file, and rewrite with a
    * plain `repartition` (round-robin — compaction balances bytes; it
    * deliberately does not re-sort, that is the z-order writer's job).
    * The oracle-checked contract: the compacted table holds byte-identical
    * data (same aggregate hash as the source table) and `compacted_ok`
    * certifies files genuinely merged (fewer files than the fragmented
    * layout, q44's contract-column pattern).
    */
  private val q131Materialized =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val q131Compaction = Q(
    "q131_compaction",
    (s, d) => {
      val base = graft.core.FixtureDirs.perApp(
        "/root/repo/target/compaction", s.sparkContext.applicationId) +
        "/d" + d.replaceAll("[^a-zA-Z0-9]", "_")
      def parquetFiles(p: String): Array[java.io.File] = {
        val fs = new java.io.File(p).listFiles()
        if (fs == null) Array.empty
        else fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
      }
      if (q131Materialized.add(base)) {
        Tables.documents(s, d).repartition(50)
          .write.mode("overwrite").parquet(base + "/small")
        val frag = parquetFiles(base + "/small")
        val targetBytes = 8L << 20
        val nTarget = math.max(1,
          math.ceil(frag.map(_.length).sum.toDouble / targetBytes).toInt)
        s.read.parquet(base + "/small").repartition(nTarget)
          .write.mode("overwrite").parquet(base + "/compact")
      }
      val nFrag = parquetFiles(base + "/small").length
      val nCompact = parquetFiles(base + "/compact").length
      s.read.parquet(base + "/compact")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .withColumn("compacted_ok", lit(nCompact < nFrag))
    },
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             TRUE AS compacted_ok
      FROM documents GROUP BY lang
    """),
  )

  val all: Seq[Q] = Seq(q119ZorderKey, q131Compaction)
}
