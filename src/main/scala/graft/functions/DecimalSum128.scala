package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact 128-bit integer SUM of unscaled decimal values (VERDICT r8 #5).
  *
  * Spark's built-in `sum` over DECIMAL(18,2) widens the buffer to
  * DECIMAL(28,2), which no longer fits a long — every per-row update then
  * runs java.math.BigDecimal add in the hot loop (q01 at sf1: 5.0 s vs
  * DuckDB's 0.04 s, which sums the same column as vectorized int128).
  * This aggregate is the Spark-expression form of DuckDB's int128 sum:
  * the input is the decimal's UNSCALED long (exact — 2-decimal money in a
  * DECIMAL(18,2) is just a long count of cents), the buffer is a 128-bit
  * two's-complement accumulator in TWO LONG buffer slots, and every
  * update/merge is pure long ALU — add, carry-out of bit 63, sign
  * extension — expressed as Catalyst expressions so HashAggregateExec
  * compiles them into whole-stage codegen with no allocation. Only the
  * once-per-group evaluate converts (hi, lo) back to a BigDecimal.
  *
  * All adds are EvalMode.LEGACY (wrapping): the low limb MUST wrap — the
  * carry formula `((a & b) | ((a | b) & ~(a + b))) >>> 63` reads the
  * wrapped result — and under Spark 4's default ANSI mode a bare Add
  * would throw on exactly the overflow the carry chain is there to
  * propagate. Exact for |Σ| < 2^127 (1.7e36 money units at scale 2 —
  * unreachable: 100 TB of lineitem rows sums to ~1e19).
  *
  * A third long slot counts non-null inputs so the empty/all-null group
  * returns NULL exactly like built-in `sum`.
  */
case class DecimalSum128(child: Expression, resultScale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, resultScale)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_sum128 takes an unscaled LONG input, got " +
        child.dataType.simpleString)

  private lazy val hi = AttributeReference("sum128_hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("sum128_lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("sum128_cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** (hi, lo) += (hiB, loB), 128-bit two's complement. */
  private def add128(hiA: Expression, loA: Expression,
      hiB: Expression, loB: Expression): (Expression, Expression) = {
    val newLo = wadd(loA, loB)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loA, loB),
        BitwiseAnd(BitwiseOr(loA, loB), BitwiseNot(newLo))),
      Literal(63))
    (wadd(wadd(hiA, hiB), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val v = If(IsNull(child), Literal(0L), child)
    val vHi = ShiftRight(v, Literal(63)) // sign-extend into the high limb
    val (nHi, nLo) = add128(hi, lo, vHi, v)
    Seq(nHi, nLo, If(IsNull(child), cnt, wadd(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nHi, nLo, wadd(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, dataType),
      Int128ToDecimal(hi, lo, resultScale))

  override protected def withNewChildInternal(newChild: Expression): DecimalSum128 =
    copy(child = newChild)
}

/** Exact 128-bit SUM of the per-row PRODUCT of two unscaled longs — the
  * revenue aggregate's form. The per-row multiply itself is WIDENED to
  * 128 bits before accumulation (`Math.multiplyHigh` for the signed high
  * limb, a wrapping multiply for the low), so a DECIMAL(18,2) price near
  * its 10^18-unscaled ceiling times the 10^4-scale discount factor can
  * never truncate — the plain-Column formulation `pu * (10^4 − du)` would
  * wrap silently in legacy eval mode (or throw under ANSI) once the
  * product passes 2^63, which domain knowledge made unreachable for
  * TPC-H prices but nothing enforced. A row where EITHER side is NULL
  * contributes nothing, exactly like `sum(a*b)`; exact for |Σ| < 2^127.
  */
case class DecimalProductSum128(left: Expression, right: Expression,
    resultScale: Int)
    extends DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, resultScale)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_product_sum128 takes two unscaled LONG inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private lazy val hi = AttributeReference("psum128_hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("psum128_lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("psum128_cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  private def add128(hiA: Expression, loA: Expression,
      hiB: Expression, loB: Expression): (Expression, Expression) = {
    val newLo = wadd(loA, loB)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loA, loB),
        BitwiseAnd(BitwiseOr(loA, loB), BitwiseNot(newLo))),
      Literal(63))
    (wadd(wadd(hiA, hiB), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val anyNull = Or(IsNull(left), IsNull(right))
    val a = If(anyNull, Literal(0L), left)
    val b = If(anyNull, Literal(0L), right)
    // exact signed 128-bit product: high limb from Math.multiplyHigh
    // (codegen'd static call), low limb from the wrapping long multiply
    val pHi = objects.StaticInvoke(classOf[java.lang.Math], LongType,
      "multiplyHigh", Seq(a, b), Seq(LongType, LongType),
      returnNullable = false)
    val pLo = Multiply(a, b, EvalMode.LEGACY)
    val (nHi, nLo) = add128(hi, lo, pHi, pLo)
    Seq(nHi, nLo, If(anyNull, cnt, wadd(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nHi, nLo, wadd(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, dataType),
      Int128ToDecimal(hi, lo, resultScale))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalProductSum128 =
    copy(left = newLeft, right = newRight)
}

/** (hi, lo) two's-complement 128-bit → Decimal(38, scale). Runs once per
  * output group (the aggregate's evaluate). Generates a direct static call
  * — CodegenFallback would NOT work here: the aggregate result projection
  * feeds codegen vars with a null INPUT_ROW, which fallback interpolation
  * rejects (cannotInterpolateClassIntoCodeBlockError).
  */
case class Int128ToDecimal(hiE: Expression, loE: Expression, scale: Int)
    extends Expression {

  override def children: Seq[Expression] = Seq(hiE, loE)
  override def nullable: Boolean = false
  override def dataType: DataType = DecimalType(38, scale)

  override def eval(input: InternalRow): Any =
    Int128ToDecimal.toDecimal(
      hiE.eval(input).asInstanceOf[Long],
      loE.eval(input).asInstanceOf[Long],
      scale)

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val hiCode = hiE.genCode(ctx)
    val loCode = loE.genCode(ctx)
    ev.copy(
      code = code"""
        ${hiCode.code}
        ${loCode.code}
        org.apache.spark.sql.types.Decimal ${ev.value} =
          graft.functions.Int128ToDecimal$$.MODULE$$.toDecimal(
            ${hiCode.value}, ${loCode.value}, $scale);
      """,
      isNull = codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Int128ToDecimal =
    copy(hiE = newChildren(0), loE = newChildren(1))
}

object Int128ToDecimal {
  /** Static so generated code can call it without a references slot. */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(BigDecimal(new java.math.BigDecimal(bi, scale)), 38, scale)
  }
}

object DecimalSum128 {
  /** SUM of `unscaled` (a LONG of decimal units at `scale`) as
    * Decimal(38, scale) — NULL on an empty/all-null group like `sum`.
    */
  def sumUnscaled(unscaled: Column, scale: Int): Column =
    ColumnBridge.column(
      DecimalSum128(ColumnBridge.expression(unscaled), scale)
        .toAggregateExpression())

  /** The unscaled long of a ≤18-precision decimal column. */
  def unscaled(c: Column): Column =
    ColumnBridge.column(UnscaledValue(ColumnBridge.expression(c)))

  /** SUM of the 128-bit-exact per-row product `a × b` (both unscaled
    * longs) as Decimal(38, scale) — NULL on an empty/all-null group.
    */
  def sumProductUnscaled(a: Column, b: Column, scale: Int): Column =
    ColumnBridge.column(
      DecimalProductSum128(
        ColumnBridge.expression(a), ColumnBridge.expression(b), scale)
        .toAggregateExpression())
}
