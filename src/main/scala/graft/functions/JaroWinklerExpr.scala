package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler string similarity (Jaro, "Advances in record-
  * linkage methodology", JASA 1989; Winkler, "String comparator metrics
  * and enhanced decision rules in the Fellegi-Sunter model", ASA SRM
  * 1990) — the approximate field comparator the linkage layer needs:
  * exact equality treats a truncated name as a FULL disagreement, where
  * JW ≥ threshold keeps the per-field evidence the FS scorer was built
  * for. Spark ships `levenshtein` but no Jaro-Winkler; DuckDB ships
  * `jaro_winkler_similarity`, which is the oracle this expression is
  * hash-verified against (standard parameters: boost threshold 0.7,
  * prefix weight 0.1, prefix cap 4; one empty side → 0.0 — fuzz-matched
  * to DuckDB 1.0.0 on 3000 random cases before this was written).
  *
  * REAL `doGenCode` (not CodegenFallback): the generated code calls the
  * static kernel below — the same shape as Spark's own `levenshtein`
  * (codegen calls `UTF8String.levenshteinDistance`) — so the expression
  * stays inside whole-stage codegen with no interpreted row boundary.
  *
  * The kernel walks UTF-16 code units; for the ASCII corpus this equals
  * codepoint semantics (and DuckDB's byte walk). O(l1·window) time,
  * two bool arrays bounded by string length — row-local, shuffle-free.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerExpr.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpr.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  private val BoostThreshold = 0.7
  private val PrefixWeight = 0.1
  private val PrefixCap = 4

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro > BoostThreshold) {
      var p = 0
      while (p < PrefixCap && p < l1 && p < l2 &&
        s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + PrefixWeight * p * (1.0 - jaro)
    } else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
