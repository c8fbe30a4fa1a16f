package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All association-rule count tags of one session basket in a single
  * walk (q164): for a basket of n items, emits 1 session tag
  * (null, null), n item tags (item, null) and n·(n−1)/2 ordered pair
  * tags (item_i, item_j) for i < j — the tag-explode input whose global
  * count yields ns / n1 / n_ab in one aggregation. The composed
  * `concat(array(...), transform(...), flatten(transform(transform(
  * slice(...)))))` chain ran four interpreted lambdas per basket
  * (CodegenFallback); this allocates exactly the output array. Order
  * within the array is irrelevant downstream (it feeds an explode →
  * count), but matches the composed form anyway: session, items in
  * basket order, pairs in (i, j) lexicographic basket order.
  */
case class BasketTags(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"basket_tags requires array<string> with non-null elements, got " +
        other.simpleString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item_a", StringType, nullable = true),
      StructField("item_b", StringType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BasketTags.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BasketTags.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BasketTags =
    copy(child = newChild)
}

object BasketTags {

  def compute(ts: ArrayData): ArrayData = {
    val n = ts.numElements()
    val out = new Array[Any](1 + n + n * (n - 1) / 2)
    out(0) = new GenericInternalRow(Array[Any](null, null))
    var o = 1
    var i = 0
    while (i < n) {
      out(o) = new GenericInternalRow(Array[Any](ts.getUTF8String(i), null))
      o += 1
      i += 1
    }
    i = 0
    while (i < n) {
      val a = ts.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(o) = new GenericInternalRow(Array[Any](a, ts.getUTF8String(j)))
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(ts: Column): Column =
    ColumnBridge.column(BasketTags(ColumnBridge.expression(ts)))
}
