package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for q_v_outliers_ecod_grid's cost structure. */
object EcodProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val df = graft.Tables(s, dir, "lineitem")
    val finite = cols.map { c =>
      val v = col(c).cast("double")
      v.isNotNull && !isnan(v) && abs(v) =!= lit(Double.PositiveInfinity)
    }.reduce(_ && _)
    val base = df.filter(finite)
    time("base count")(println(base.count()))
    val gridN = 255
    val levelsSql = (1 to gridN).map(i => (i.toDouble / (gridN + 1)).toString)
      .mkString("array(", ", ", ")")
    val grids = base.agg(
      expr(s"transform(percentile(${cols.head}, $levelsSql), e -> round(e, 6))")
        .as(s"_b_${cols.head}"),
      cols.tail.map(c =>
        expr(s"transform(percentile($c, $levelsSql), e -> round(e, 6))")
          .as(s"_b_$c")): _*)
    val collected = time("percentile pass")(grids.collect())
    println(collected.head.schema.fieldNames.mkString(","))
    val g1 = lit((gridN + 1).toDouble)
    // current: filter-HOF (allocates 6 arrays per row)
    val scoreFilter = cols.map { c =>
      val le = size(expr(s"filter(_b_$c, e -> e <= $c)")).cast("double")
      val ge = size(expr(s"filter(_b_$c, e -> e >= $c)")).cast("double")
      -log(least(greatest(le, lit(1.0)) / g1, greatest(ge, lit(1.0)) / g1))
    }.reduce(_ + _)
    val joined = base.crossJoin(broadcast(grids))
    time("scoring scan (filter HOF)")(
      println(joined.select(round(scoreFilter, 6).as("s"))
        .orderBy(col("s").desc).limit(100).collect().length))
    // candidate: aggregate-HOF (no intermediate arrays)
    val scoreAgg = cols.map { c =>
      val le = expr(s"aggregate(_b_$c, 0, (acc, e) -> acc + IF(e <= $c, 1, 0))").cast("double")
      val ge = expr(s"aggregate(_b_$c, 0, (acc, e) -> acc + IF(e >= $c, 1, 0))").cast("double")
      -log(least(greatest(le, lit(1.0)) / g1, greatest(ge, lit(1.0)) / g1))
    }.reduce(_ + _)
    time("scoring scan (aggregate HOF)")(
      println(joined.select(round(scoreAgg, 6).as("s"))
        .orderBy(col("s").desc).limit(100).collect().length))
    s.stop()
  }
}
