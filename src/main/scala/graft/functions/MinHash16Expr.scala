package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native 16-hash MinHash signature over distinct 3-token shingles — the
  * native-expression rung of the MinHash ladder. Same math as
  * `DedupQueries.minhashSignatures` (and therefore the same DuckDB
  * oracle): tokens = split(text, " ") with Spark's keep-empties
  * semantics, shingles = consecutive token triples joined by " ",
  * DISTINCT per doc, h = first-8-md5-hex-chars as an unsigned 32-bit
  * int, signature k = min over shingles of (a_k·h + b_k) mod P.
  *
  * The builtin-column rung materializes every (doc, shingle) row,
  * shuffles them through a distinct + 16-way min aggregation; this rung
  * computes the whole signature in ONE narrow projection — zero shuffle,
  * scan → project — which is the shape that carries to 10^12 docs.
  * CodegenFallback because MessageDigest is not expressible in generated
  * code. Null for docs with fewer than 3 tokens (the column rung's
  * size-filter drops them the same way).
  */
case class MinHash16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash16"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 3) return null
    val md = Md5Local.get()
    val mins = Array.fill(16)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var k = 0
        while (k < 16) {
          val v = (h * MinHash16Expr.A(k) + MinHash16Expr.B(k)) % MinHash16Expr.P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16Expr {
  val P: Long = graft.DedupQueries.MinhashP
  // the same md5-derived affine coefficients the column rung and the
  // DuckDB oracle use (bounded under 2^30: a·h < 2^62 never overflows)
  val A: Array[Long] = Array.tabulate(16)(i => graft.DedupQueries.mhCoeff("a", i))
  val B: Array[Long] = Array.tabulate(16)(i => graft.DedupQueries.mhCoeff("b", i))

  def minhash16(text: Column): Column =
    GraftColumnBridge.column(MinHash16Expr(GraftColumnBridge.expression(text)))
}
