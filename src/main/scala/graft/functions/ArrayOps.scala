package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Set-algebra kernels over SORTED string arrays.
  *
  * `size(array_intersect(a, b))` evaluates interpreted and pairwise
  * (O(n·m) UTF8String equality probes per row) — the dominant cost in
  * pairwise Jaccard verification. For the canonical shingle sets the
  * dedup operators produce (sorted + distinct by construction), a
  * merge-scan counts the intersection in O(n+m) inside whole-stage
  * codegen. Value parity with `size(array_intersect)` holds exactly on
  * sorted distinct inputs.
  */
object ArrayOps {

  def sortedIntersectSizeKernel(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var j = 0; var n = 0L
    val la = a.numElements(); val lb = b.numElements()
    while (i < la && j < lb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      // null ELEMENTS (sort_array puts them first): a null in both
      // counts once — the same treatment array_intersect gives a null
      // member — instead of NPE-ing in x.compareTo
      if (x == null && y == null) { n += 1; i += 1; j += 1 }
      else if (x == null) i += 1
      else if (y == null) j += 1
      else {
        val c = x.compareTo(y)
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectSizeKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ArrayOps.sortedIntersectSizeKernel($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** |a ∩ b| for sorted distinct string arrays (bigint). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))
}
