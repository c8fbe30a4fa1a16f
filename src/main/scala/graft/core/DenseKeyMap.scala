package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Dense-domain dimension map: when a dimension's integer key is DENSE
  * (TPC-H-style surrogate keys 0..N−1) and its payload is a small code
  * (a nationkey, a bucket id — anything in [0,127]), the entire
  * key→code relation packs into ONE byte array of `range` bytes. A
  * broadcast of that array replaces the equi-join against the dimension
  * with a map-side array index — no shuffle of the fact side, no
  * HashedRelation build (which costs ~30× the bytes for the same
  * relation: 8-byte key + boxed row + hash slots vs 1 byte/key here).
  *
  * This is the q157 fact-join killer: lineitem⋈orders carried one
  * 6M×1.5M equi-join per query (the measured ~3× residue vs DuckDB at
  * sf1/sf10) whose entire payload was orders' cust-nation code; as a
  * 1.5 MB (sf1) / 15 MB (sf10) byte array the join disappears into the
  * fact scan's own projection.
  *
  * Scale gates (the [[Hints]] stance — never force a shape that cannot
  * degrade). Two, both required:
  *  1. BEFORE the collect: the pairs frame's optimizer size estimate
  *     must be under 16× the cap (derived from the scan's file-size
  *     statistic, no job — same basis as [[Hints.isDimSized]]), so an
  *     SF-scaling domain never starts a driver-sized transfer.
  *  2. BEFORE the allocation: the observed key range must fit
  *     `graft.densemap.capBytes` (default 64 MB = 64M distinct keys).
  * Past either gate `build` returns None and the caller keeps its join
  * formulation — at 100 TB (billions of orderkeys) the gates close and
  * the fact join shuffles exactly as before.
  */
final class DenseKeyMap private[core] (
    minKey: Long,
    bc: Broadcast[Array[Byte]]) extends Serializable {

  /** code(key) as a Column: the array index, NULL when the key has no
    * mapped code (missing dimension row) — callers that need inner-join
    * drop semantics filter `isNotNull`. A native codegen expression, not
    * a UDF: the lookup runs inside whole-stage codegen on primitive
    * longs (a UDF would box two java.lang.Longs per fact row — 120M
    * allocations on a 60M-row scan with two lookups).
    */
  def code(key: Column): Column =
    ColumnBridge.column(DenseKeyMap.Lookup(
      ColumnBridge.expression(key.cast("long")), minKey, bc))
}

object DenseKeyMap {

  val CapConf = "graft.densemap.capBytes"
  val DefaultCapBytes: Long = 64L << 20

  /** The array-index lookup as a codegen'd Catalyst expression. Tasks
    * carry the Broadcast HANDLE (resolved executor-side, once per
    * executor — never serialized into the task binary); the generated
    * code reads a cached `byte[]` field, so the hot path is one bounds
    * check + one array load per row inside whole-stage codegen.
    */
  case class Lookup(child: Expression, lo: Long, bc: Broadcast[Array[Byte]])
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"dense-map lookup requires bigint, got ${child.dataType.simpleString}")

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    // generated-code accessor: resolve the broadcast once per task thread
    @transient private lazy val mapArr: Array[Byte] = bc.value
    def arr(): Array[Byte] = mapArr

    override def nullSafeEval(input: Any): Any = {
      val off = input.asInstanceOf[Long] - lo
      val a = mapArr
      if (off < 0 || off >= a.length || a(off.toInt) < 0) null
      else java.lang.Integer.valueOf(a(off.toInt).toInt)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("denseMap", this, classOf[Lookup].getName)
      val arrVar = ctx.addMutableState("byte[]", "denseMapArr",
        v => s"$v = $ref.arr();")
      val childGen = child.genCode(ctx)
      val off = ctx.freshName("off")
      ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${childGen.isNull}) {
          long $off = ${childGen.value} - ${lo}L;
          if ($off >= 0 && $off < $arrVar.length && $arrVar[(int) $off] >= 0) {
            ${ev.isNull} = false;
            ${ev.value} = (int) $arrVar[(int) $off];
          }
        }""", isNull = ev.isNull, value = ev.value)
    }

    override protected def withNewChildInternal(newChild: Expression): Lookup =
      copy(child = newChild)
  }

  /** Build the map, or None when the key domain outgrows the cap.
    *
    * One Spark job (the packed collect: primitive (key, code) arrays,
    * 9 bytes/entry on the wire — the same driver transfer a broadcast
    * join would make, minus the per-row object graph). Key min/max come
    * from the packed chunks themselves, so no separate statistics job
    * runs; null keys/codes are skipped (an equi-join would drop them
    * identically).
    *
    * @param pairs (key, code) relation — one code per key, codes in
    *              [0,127]
    * @param measuredScan frame whose size estimate stands in for `pairs`
    *                     in gate 1 — REQUIRED when `pairs` contains a
    *                     join (without CBO, Catalyst's join statistics
    *                     multiply child sizes, so a joined pairs frame
    *                     reads as absurdly over-cap and the gate would
    *                     never open); pass the raw dimension scan, same
    *                     basis as [[Hints.isDimSized]]
    */
  def build(
      pairs: DataFrame,
      keyCol: String,
      codeCol: String,
      measuredScan: Option[DataFrame] = None): Option[DenseKeyMap] = {
    val spark = pairs.sparkSession
    val cap = math.min(
      spark.conf.get(CapConf, DefaultCapBytes.toString).toLong,
      (Int.MaxValue - 8).toLong)
    // gate 1: never start an unbounded driver transfer. The optimizer
    // estimate derives from the scan's compressed file size; 16× the
    // array cap comfortably covers the 9-bytes-per-entry packed wire
    // format for any domain the range gate could accept.
    if (measuredScan.getOrElse(pairs)
        .queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(16) * cap)
      return None
    val packed = pairs
      .select(col(keyCol).cast("long"), col(codeCol).cast("int"))
      .queryExecution.toRdd.mapPartitions { it =>
        val ks = new scala.collection.mutable.ArrayBuilder.ofLong
        val cs = new scala.collection.mutable.ArrayBuilder.ofByte
        it.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1)) {
            val c = r.getInt(1)
            require(0 <= c && c <= 127,
              s"dense-map code $c for key ${r.getLong(0)} outside [0,127]")
            ks += r.getLong(0)
            cs += c.toByte
          }
        }
        Iterator.single((ks.result(), cs.result()))
      }.collect()
    var lo = Long.MaxValue
    var hi = Long.MinValue
    packed.foreach { case (ks, _) =>
      var i = 0
      while (i < ks.length) {
        val k = ks(i)
        if (k < lo) lo = k
        if (k > hi) hi = k
        i += 1
      }
    }
    if (lo > hi) return None // empty dimension: nothing to map
    val range = hi - lo + 1
    // gate 2: the array itself must fit the cap (and an Int index)
    if (range > cap) return None
    val arr = new Array[Byte](range.toInt)
    java.util.Arrays.fill(arr, -1: Byte)
    packed.foreach { case (ks, cs) =>
      var i = 0
      while (i < ks.length) {
        arr((ks(i) - lo).toInt) = cs(i)
        i += 1
      }
    }
    Some(new DenseKeyMap(lo, spark.sparkContext.broadcast(arr)))
  }
}
