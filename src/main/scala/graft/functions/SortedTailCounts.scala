package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_tail_counts(sorted_array, x)` → struct(le, ge): how many
  * elements of an ascending-sorted double array are ≤ x (`le` =
  * upper-bound index) and ≥ x (`ge` = n − lower-bound index), duplicate
  * elements counted — two O(log n) binary searches per evaluation with
  * zero allocation (elements read in place via `ArrayData.getDouble`).
  *
  * Exists because the grid-ECDF scorer's per-row tail lookup is
  * per-element work in every builtin formulation: `size(filter(arr,
  * e -> e <= x))` and the `aggregate` equivalent evaluate an interpreted
  * lambda per array element per row — HigherOrderFunction lambdas never
  * enter whole-stage codegen — which priced the 255-point grid scan over
  * 600 k rows × 6 lookups at 57 s (filter, allocating a throwaway array
  * per lookup) / 66 s (aggregate, boxing an accumulator per element).
  * This expression does the same lookups in ~16 comparisons each
  * (measured: the scan drops to ~2 s). Same isolated-leaf discipline as
  * [[ImageFactsExpr]]: a CodegenFallback node whose surrounding
  * projection stays code-generated.
  */
case class SortedTailCounts(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "sorted_tail_counts"

  override def dataType: DataType = StructType(Seq(
    StructField("le", IntegerType, nullable = false),
    StructField("ge", IntegerType, nullable = false)))

  override protected def nullSafeEval(arr: Any, x: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val v = x.asInstanceOf[Double]
    val n = a.numElements()
    var lo = 0
    var hi = n
    while (lo < hi) { // upper bound: first index with a(i) > v
      val m = (lo + hi) >>> 1
      if (a.getDouble(m) <= v) lo = m + 1 else hi = m
    }
    val ub = lo
    lo = 0
    hi = n
    while (lo < hi) { // lower bound: first index with a(i) >= v
      val m = (lo + hi) >>> 1
      if (a.getDouble(m) < v) lo = m + 1 else hi = m
    }
    InternalRow(ub, n - lo)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedTailCounts {
  /** Column API: `sortedTailCounts(sortedArr, x)` → struct(le, ge). */
  def sortedTailCounts(sortedArr: Column, x: Column): Column =
    GraftColumnBridge.column(SortedTailCounts(
      GraftColumnBridge.expression(sortedArr), GraftColumnBridge.expression(x)))
}
