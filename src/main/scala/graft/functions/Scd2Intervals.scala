package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** In-array SCD2 interval closure in ONE codegen-stage pass — the native
  * form of the `transform(vs, (x, i) => …exists(slice(vs, 1, i), …))`
  * composition (ScalePatterns.scd2Closed), whose higher-order functions
  * run as CodegenFallback (interpreted, one closure call per element per
  * probe — the residual constant PERF.md item 11 tracked).
  *
  * Input: the per-key version array `array<struct<version:int, p:string,
  * vf:date>>`, versions in order. Output per element i, byte-identical to
  * the composed form INCLUDING its null semantics (ADVICE r10: the type
  * check admits nullable elements/fields, so the closure must define them,
  * not read garbage):
  *   - p:    the version's attribute value (null for a null element)
  *   - ic:   is_current — the successor's vf is null-or-absent (`vt
  *           .isNull` in the composed form: a null next-vf reads as an
  *           open interval)
  *   - span: datediff(vs[i+1].vf, vs[i].vf); null when either side is
  *           null or there is no successor
  *   - ko:   the composed `last || !exists(earlier, q => q.p === p)`
  *           under three-valued logic — 1 when last or provably first,
  *           0 when an earlier element provably carries the same p, NULL
  *           when the probe is undecidable (p is null with earlier
  *           elements, or no match but a null earlier p) — so a
  *           downstream sum() skips it exactly as it did the composed
  *           NULL
  * The earlier-p probe is linear over the elements before i — arrays are
  * ≤ a handful of versions per key, and the whole closure is map-side.
  */
case class Scd2Intervals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 3
            && fields(1).dataType == StringType
            && fields(2).dataType == DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"scd2_intervals requires array<struct<_, p string, vf date>>, " +
              s"got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("p", StringType, nullable = true),
      StructField("ic", BooleanType, nullable = false),
      StructField("span", IntegerType, nullable = true),
      // nullable: the three-valued first-occurrence probe (see above)
      StructField("ko", LongType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Scd2Intervals.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Scd2Intervals.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Scd2Intervals =
    copy(child = newChild)
}

object Scd2Intervals {

  def compute(vs: ArrayData): ArrayData = {
    val n = vs.numElements()
    val out = new Array[Any](n)
    // field accessors that survive null elements / null fields
    def pOf(i: Int) = {
      val x = if (vs.isNullAt(i)) null else vs.getStruct(i, 3)
      if (x == null || x.isNullAt(1)) null else x.getUTF8String(1)
    }
    def vfOf(i: Int): Integer = {
      val x = if (vs.isNullAt(i)) null else vs.getStruct(i, 3)
      if (x == null || x.isNullAt(2)) null else Integer.valueOf(x.getInt(2))
    }
    var i = 0
    while (i < n) {
      val p = pOf(i)
      val vf = vfOf(i)
      val last = i == n - 1
      val vt: Integer = if (last) null else vfOf(i + 1)
      val row = new GenericInternalRow(4)
      row.update(0, p)
      // composed ic = vt.isNull: no successor OR successor's vf is null
      row.setBoolean(1, vt == null)
      if (vt == null || vf == null) row.setNullAt(2)
      else row.setInt(2, vt.intValue() - vf.intValue())
      // three-valued exists(earlier, q => q.p === p): TRUE beats NULL
      // beats FALSE; ko = last || !exists under the same logic
      var seen = false
      var undecided = false
      var j = 0
      while (!seen && j < i) {
        val q = pOf(j)
        if (q == null || p == null) undecided = true
        else if (q.equals(p)) seen = true
        j += 1
      }
      if (last) row.setLong(3, 1L)
      else if (seen) row.setLong(3, 0L)
      else if (undecided) row.setNullAt(3)
      else row.setLong(3, 1L)
      out(i) = row.asInstanceOf[InternalRow]
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(vs: Column): Column =
    ColumnBridge.column(Scd2Intervals(ColumnBridge.expression(vs)))
}
