package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Column profiler + constraint suggestion: profile stats match a
  * plain-Scala recomputation on a planted frame (nulls included, so the
  * sub-1.0 completeness arm fires), the suggested suite PASSES on the
  * table it was profiled from (the profile→suggest→verify loop), and
  * the approx-NDV rung stays within sketch tolerance.
  */
class ProfilerSpec extends SparkTestBase {

  private lazy val planted = {
    import spark.implicits._
    // v: 3 nulls of 10 → completeness 0.7 → complete arm at the 0.05 grid;
    // s: 3 distinct values → in_set; id: unique integral
    Seq[(Long, Option[Double], String)](
      (1L, Some(2.0), "a"), (2L, Some(4.0), "b"), (3L, None, "a"),
      (4L, Some(8.0), "c"), (5L, None, "b"), (6L, Some(1.0), "a"),
      (7L, Some(0.5), "c"), (8L, None, "a"), (9L, Some(2.5), "b"),
      (10L, Some(4.5), "a"))
      .toDF("id", "v", "s")
  }

  test("profile matches plain-Scala recomputation, nulls included") {
    val p = Profiler.profile(planted).collect()
      .map(r => r.getString(0) -> r).toMap
    val vVals = Seq(2.0, 4.0, 8.0, 1.0, 0.5, 2.5, 4.5)
    val n = 10.0
    val vRow = p("v")
    assert(vRow.getLong(2) == 10 && vRow.getLong(3) == 7)
    assert(vRow.getDouble(4) == 0.7) // completeness
    assert(vRow.getLong(5) == 7)     // ndv
    assert(vRow.getDouble(7) == 0.5 && vRow.getDouble(8) == 8.0)
    val mean = vVals.sum / 7
    assert(math.abs(vRow.getDouble(9) - math.rint(mean * 1e4) / 1e4) < 1e-9)
    val sd = math.sqrt(vVals.map(x => (x - mean) * (x - mean)).sum / 6)
    assert(math.abs(vRow.getDouble(10) - sd) < 1e-3,
      s"stddev ${vRow.getDouble(10)} vs $sd")
    val sRow = p("s")
    assert(sRow.getString(1) == "string" && sRow.getLong(5) == 3)
    assert(sRow.getLong(11) == 1 && sRow.getLong(12) == 1) // len 1..1
    val idRow = p("id")
    assert(idRow.getString(1) == "integral" && idRow.getDouble(6) == 1.0)
  }

  test("suggested suite passes on the table it was profiled from") {
    val sugg = Profiler.suggest(planted, inSetMaxNdv = 5)
    val rows = sugg.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("id", "unique")))
    assert(rows.contains(("id", "in_range")))
    assert(rows.contains(("s", "in_set")))
    assert(rows.contains(("v", "complete")))
    assert(!rows.contains(("v", "unique")), "nullable v must not suggest unique")
    // sub-1.0 completeness lands on the 0.05 grid
    val vComplete = sugg.filter(col("column") === "v" && col("check") === "complete")
      .collect()(0).getDouble(4)
    assert(vComplete == 0.7)
    // the loop closes: every suggested constraint holds on the source
    val verdicts = Profiler.toSuite(sugg).run(planted).collect()
    assert(verdicts.nonEmpty && verdicts.forall(_.getBoolean(2)),
      s"suggested suite must pass: ${verdicts.mkString(", ")}")
  }

  test("approx-NDV rung: no exact distinct, sketch within tolerance") {
    val p = Profiler.profile(planted, exactNdv = false).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(math.abs(p("id") - 10L) <= 1 && math.abs(p("v") - 7L) <= 1 &&
      math.abs(p("s") - 3L) <= 1)
  }

  test("NaN/±Inf excluded from numeric stats, counted in n_nonfinite") {
    import spark.implicits._
    // x: 2 finite, NaN, +Inf, -Inf, null → fc=2, n_nonfinite=3 (null is
    // NOT nonfinite — it's already outside n_nonnull); y: all nonfinite
    val df = Seq(
      (1.0, Double.NaN), (3.0, Double.PositiveInfinity),
      (Double.NaN, Double.NegativeInfinity),
      (Double.PositiveInfinity, Double.NaN),
      (Double.NegativeInfinity, Double.NaN))
      .toDF("x", "y")
      .union(Seq((Option.empty[Double], Option.empty[Double])).toDF("x", "y"))
    val p = Profiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val x = p("x")
    assert(x.getLong(3) == 5, "n_nonnull counts nonfinite values")
    assert(x.getDouble(7) == 1.0 && x.getDouble(8) == 3.0, "min/max finite-only")
    assert(x.getDouble(9) == 2.0, "mean over the 2 finite values")
    assert(x.getLong(15) == 3, "x has 3 nonfinite")
    val y = p("y")
    assert(y.isNullAt(7) && y.isNullAt(9), "all-nonfinite: no numeric stats")
    assert(y.getLong(15) == 5)
    // suggest must not emit an in_range arm for the all-nonfinite column
    val sugg = Profiler.suggest(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sugg.contains(("x", "in_range")) && !sugg.contains(("y", "in_range")))
  }

  test("suggest on a frame with no low-cardinality strings emits str_len, not in_set") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, s"text_$i")).toDF("k", "t")
    val sugg = Profiler.suggest(df, inSetMaxNdv = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sugg.contains(("t", "str_len")) && !sugg.contains(("t", "in_set")))
  }
}
