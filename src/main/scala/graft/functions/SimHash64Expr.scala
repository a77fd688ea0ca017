package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over whitespace tokens — the tier-(b) rung of the
  * SimHash ladder (SURVEY §7.3): same algorithm as the builtin-HOF variant
  * (`q_dedup_simhash64_prod`) and the same md5-derived bits as the DuckDB
  * oracle, but one tight primitive loop per row instead of per-token
  * 64-element array allocations. CodegenFallback because MessageDigest is
  * not expressible in generated code; the expression is still a single
  * narrow projection in the scan stage.
  *
  * Bit b of a token = bit (b%4) of md5-hex-nibble (b/4); per-doc weight
  * w_b = Σ tokens (2·bit_b − 1); signature bit b = w_b > 0. Emitted as two
  * 32-bit halves (lo = bits 0..31, hi = 32..63) matching the oracle's
  * engine-safe representation. Null for token-less docs (the oracle's
  * GROUP BY emits no row for them).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"

  override def dataType: DataType = SimHash64Expr.schema

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.toString
    val md = Md5Local.get()
    val w = new Array[Int](64)
    var any = false
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) { // non-empty token
          any = true
          md.reset()
          val d = md.digest(text.substring(start, i).getBytes("UTF-8"))
          var b = 0
          while (b < 64) {
            val k = b >> 2 // nibble index
            val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
            w(b) += (((nib >> (b & 3)) & 1) << 1) - 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) null
    else {
      var lo = 0L; var hi = 0L
      var b = 0
      while (b < 32) { if (w(b) > 0) lo |= 1L << b; b += 1 }
      while (b < 64) { if (w(b) > 0) hi |= 1L << (b - 32); b += 1 }
      InternalRow(lo, hi)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  val schema: StructType = StructType(Seq(
    StructField("simhash_lo", LongType, nullable = false),
    StructField("simhash_hi", LongType, nullable = false)))

  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(text)))
}

/** Per-thread reusable MD5 instance, shared by the native signature
  * expressions (MessageDigest is stateful and not thread-safe; one
  * instance per executor thread, reset per value).
  */
private[functions] object Md5Local {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = digests.get()
}
