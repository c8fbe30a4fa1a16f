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
  * vf:date>>`, versions in order, no null elements (the builder filters
  * them). Output per element i, byte-identical to the composed form:
  *   - p:    the version's attribute value
  *   - ic:   is_current — no successor version (i is last)
  *   - span: datediff(vs[i+1].vf, vs[i].vf); null when no successor
  *   - ko:   1 when i is the last element OR no EARLIER element carries
  *           the same p (the first-occurrence marker the per-(p, ic)
  *           key count aggregates), else 0
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
      StructField("ko", LongType, nullable = false))),
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
    var i = 0
    while (i < n) {
      val x = vs.getStruct(i, 3)
      val p = x.getUTF8String(1)
      val last = i == n - 1
      val row = new GenericInternalRow(4)
      row.update(0, p)
      row.setBoolean(1, last)
      if (last) row.setNullAt(2)
      else row.setInt(2, vs.getStruct(i + 1, 3).getInt(2) - x.getInt(2))
      var seen = false
      var j = 0
      while (!seen && j < i) {
        val q = vs.getStruct(j, 3).getUTF8String(1)
        seen = q != null && q.equals(p)
        j += 1
      }
      row.setLong(3, if (last || !seen) 1L else 0L)
      out(i) = row.asInstanceOf[InternalRow]
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(vs: Column): Column =
    ColumnBridge.column(Scd2Intervals(ColumnBridge.expression(vs)))
}
