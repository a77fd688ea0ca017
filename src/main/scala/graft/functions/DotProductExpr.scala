package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `dot_product(a, b)` over two double arrays — the tight-loop twin of
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, x) -> acc + x)`.
  *
  * BIT-IDENTICAL to that HOF formulation: products in index order, a
  * left fold starting at 0.0 (s += a(i)*b(i) reproduces
  * ((0.0 + p0) + p1) + … exactly), null if the lengths differ (zip_with
  * pads with null, nulling the sum) or any element is null. Exists
  * because HigherOrderFunction lambdas never enter whole-stage codegen:
  * one brute-force cosine pass evaluated ~160 M interpreted lambda
  * steps with two throwaway arrays per pair and priced q_ann_topk_*
  * at 4–7 s each at sf0.1; this leaf does the same 64 multiplies in
  * place. Same isolated-leaf discipline as [[SortedTailCounts]]: the
  * surrounding projection stays code-generated.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<double> inputs, got $l / $r")
    }

  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Column API: exact dot product of two double arrays. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
