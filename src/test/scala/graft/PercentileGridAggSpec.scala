package graft

import graft.functions.PercentileGridAgg
import org.apache.spark.sql.functions._

/** PercentileGridAgg must be VALUE-IDENTICAL to the builtin
  * `percentile(col, array(levels))` — it exists only to replace the
  * builtin's O(levels·NDV) finalize with one sort + O(1) indexing, so
  * any numeric divergence is a bug, not a tolerance question. */
class PercentileGridAggSpec extends SparkTestBase {

  private val levels = (1 to 255).map(i => i.toDouble / 256)

  private def builtinVsNative(values: Seq[java.lang.Double]): Unit = {
    import spark.implicits._
    val df = values.toDF("v").select(col("v").cast("double").as("v"))
    val levelsSql = levels.map(_.toString).mkString("array(", ", ", ")")
    val b = df.agg(expr(s"percentile(v, $levelsSql)")).head.getSeq[Double](0)
    val n = df.agg(PercentileGridAgg.percentileGrid(col("v"), levels))
      .head.getSeq[Double](0)
    assert(b.size === n.size)
    b.zip(n).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x === y, s"level index $i: builtin $x vs native $y")
    }
  }

  test("matches builtin percentile on near-unique doubles") {
    val rnd = new scala.util.Random(42)
    builtinVsNative((1 to 5000).map(_ => Double.box(rnd.nextDouble() * 1e5)))
  }

  test("matches builtin on heavy ties and negatives") {
    val rnd = new scala.util.Random(7)
    builtinVsNative((1 to 5000).map(_ =>
      Double.box((rnd.nextInt(11) - 5).toDouble / 4)))
  }

  test("skips nulls like the builtin") {
    val rnd = new scala.util.Random(13)
    builtinVsNative((1 to 2000).map(i =>
      if (i % 7 == 0) null.asInstanceOf[java.lang.Double]
      else Double.box(rnd.nextDouble() * 100 - 50)))
  }

  test("single value and empty input") {
    import spark.implicits._
    val one = Seq(3.5).toDF("v")
      .agg(PercentileGridAgg.percentileGrid(col("v"), Seq(0.1, 0.5, 0.9)))
      .head.getSeq[Double](0)
    assert(one === Seq(3.5, 3.5, 3.5))
    val empty = Seq.empty[Double].toDF("v")
      .agg(PercentileGridAgg.percentileGrid(col("v"), Seq(0.5))).head
    assert(empty.isNullAt(0))
  }

  test("survives partial-buffer serialization across many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vals = (1 to 20000).map(_ => rnd.nextDouble() * 1e6)
    val df = spark.createDataset(vals).repartition(16).toDF("v")
    val levelsSql = levels.map(_.toString).mkString("array(", ", ", ")")
    val b = df.agg(expr(s"percentile(v, $levelsSql)")).head.getSeq[Double](0)
    val n = df.agg(PercentileGridAgg.percentileGrid(col("v"), levels))
      .head.getSeq[Double](0)
    assert(b === n)
  }
}
