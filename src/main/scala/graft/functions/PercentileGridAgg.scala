package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the aggregation state of
  * [[PercentileGridAgg]]. Raw values, no boxing, no per-value map
  * entries: at the sf the engine is benched the whole column fits in a
  * task-sized array (600 k doubles = 4.8 MB), and the documented
  * 10^12-row swap for the grid scorer is the t-digest quantile sketch,
  * not this exact rung. */
final class DoubleBuf(var a: Array[Double], var n: Int) {
  def add(v: Double): Unit = {
    if (n == a.length) {
      val b = new Array[Double](math.max(16, a.length * 2))
      System.arraycopy(a, 0, b, 0, n); a = b
    }
    a(n) = v; n += 1
  }
  def merge(o: DoubleBuf): Unit = {
    if (n + o.n > a.length) {
      val b = new Array[Double](math.max(n + o.n, a.length * 2))
      System.arraycopy(a, 0, b, 0, n); a = b
    }
    System.arraycopy(o.a, 0, a, n, o.n); n += o.n
  }
}

/** Exact multi-percentile aggregate with an O(n log n + L) finalize.
  *
  * Computes the SAME values as Spark's builtin
  * `percentile(col, array(p1..pL))` — position `p·(n−1)` over the
  * ascending multiset, linear interpolation
  * `(higher−pos)·a[lower] + (pos−lower)·a[higher]`, degenerate cases
  * collapsing to `a[lower]` — but replaces the builtin's finalize,
  * which re-walks the accumulated (value,count) list PER PERCENTILE
  * (O(L·NDV): measured 12 s for one 255-level call over a 600 k-NDV
  * double column at sf0.1, the whole cost of q_v_outliers_ecod_grid),
  * with ONE sort of the raw values and O(1) direct indexing per level.
  *
  * State is the raw value array (8 B/row vs the builtin's ~32 B/entry
  * OpenHashMap on near-unique columns); partials concatenate instead of
  * hash-merging. Nulls are skipped; callers filter NaN/±Inf upstream
  * (the ECOD entry points already do).
  */
case class PercentileGridAgg(
    child: Expression,
    percentages: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  override def prettyName: String = "percentile_grid"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DoubleBuf =
    new DoubleBuf(new Array[Double](64), 0)

  override def update(buf: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoubleBuf, other: DoubleBuf): DoubleBuf = {
    buf.merge(other); buf
  }

  override def eval(buf: DoubleBuf): Any = {
    val n = buf.n
    if (n == 0) return null
    val a = java.util.Arrays.copyOf(buf.a, n)
    java.util.Arrays.sort(a)
    val out = new Array[Double](percentages.length)
    var i = 0
    while (i < percentages.length) {
      val pos = percentages(i) * (n - 1)
      val lower = math.floor(pos).toInt
      val higher = math.ceil(pos).toInt
      val lk = a(lower)
      out(i) =
        if (lower == higher) lk
        else {
          val hk = a(higher)
          if (hk == lk) lk else (higher - pos) * lk + (pos - lower) * hk
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DoubleBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val a = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { a(i) = bb.getDouble; i += 1 }
    new DoubleBuf(a, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileGridAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileGridAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PercentileGridAgg =
    copy(child = newChild)
}

object PercentileGridAgg {
  /** Column API: exact percentiles of `col` (DoubleType) at `levels`,
    * identical values to `percentile(col, array(levels…))`. */
  def percentileGrid(c: Column, levels: Seq[Double]): Column =
    GraftColumnBridge.column(
      PercentileGridAgg(GraftColumnBridge.expression(c), levels)
        .toAggregateExpression())
}
