package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All random-hyperplane sign bits of an embedding in ONE fused pass —
  * the signature stage of LSH candidate generation (q41). The composed
  * form ran `aggregate(zip_with(transform(emb, cast), signs, *), +)` per
  * plane — three interpreted higher-order lambdas and two intermediate
  * arrays PER PLANE per row, ~36 planes at sf1 (measured: the candidate
  * stage was 10 s at 20k vectors, i.e. microseconds of arithmetic behind
  * seconds of lambda dispatch). This walks the embedding once per plane
  * inside a single codegen'd loop: bit p = '1' iff
  * Σ_d emb[d]·sign[p·dim+d] ≥ 0, accumulated left to right in double —
  * the same IEEE evaluation order as the composed fold, so the emitted
  * bit string (and every downstream bucket) is identical.
  *
  * The sign grid rides in the expression as a plain row-major
  * Array[Double] (nPlanes × dim literals — derived driver-side from the
  * md5 recipe the oracle mirrors); it is a few KB even at wide band
  * configurations, serialized once per task, never per row.
  */
case class LshSignBits(child: Expression, signs: Array[Double], dim: Int)
    extends UnaryExpression {

  private def nPlanes: Int = signs.length / dim

  // dim > 0 FIRST: evaluating `signs.length % dim` under dim == 0 would
  // throw ArithmeticException out of the analyzer instead of returning the
  // TypeCheckFailure this method exists to produce (ADVICE r11).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if dim > 0 && signs.length % dim == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits requires a float/double array (grid ${signs.length} " +
        s"must be a non-empty multiple of dim=$dim), got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(emb: Any): Any =
    LshSignBits.compute(
      emb.asInstanceOf[ArrayData], signs, dim, nPlanes, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val grid = ctx.addReferenceObj("lshSigns", signs, "double[]")
    val isF = if (elemIsFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, e =>
      s"""${ev.value} = graft.functions.LshSignBits.compute(
            $e, $grid, $dim, $nPlanes, $isF);""")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBits =
    copy(child = newChild)
}

object LshSignBits {

  def compute(emb: ArrayData, signs: Array[Double], dim: Int, nPlanes: Int,
      isFloat: Boolean): UTF8String = {
    // Runtime input contract (ADVICE r11): the grid is built for exactly
    // `dim`-long dense vectors. The parquet list schema can't promise
    // either length or element non-nullness statically (list elements are
    // optional in the driver's files even though none are null), so a
    // ragged or null-holed embedding must FAIL here with the real cause —
    // silently truncating / zero-filling would hash the vector into a
    // wrong (and oracle-divergent) bucket.
    if (emb.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_sign_bits: embedding length ${emb.numElements()} != dim $dim")
    // one null scan + one copy-to-dense up front, not per plane: the plane
    // loop then runs on a primitive array with no per-element branch
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (emb.isNullAt(i))
        throw new IllegalArgumentException(
          s"lsh_sign_bits: null element at index $i of a $dim-dim embedding")
      v(i) = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      i += 1
    }
    val bits = new Array[Byte](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += v(d) * signs(off + d)
        d += 1
      }
      bits(p) = if (dot >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(bits)
  }

  /** Column-API entry point: the nPlanes-bit sign string of `emb` under
    * the row-major `signs` grid (nPlanes × dim).
    */
  def apply(emb: Column, signs: Array[Double], dim: Int): Column =
    ColumnBridge.column(LshSignBits(ColumnBridge.expression(emb), signs, dim))
}
