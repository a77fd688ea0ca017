package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Closed-form distribution checks + the correlation matrix, pinned
  * against plain-Scala recomputation on planted data with known
  * structure: exact ±1 correlations, pairwise-complete null handling,
  * a Benford-conforming log-uniform sample vs a flat-digit sample, and
  * an independent vs a diagonal (fully coupled) contingency table —
  * including the unobserved-cell contribution that dropping empty grid
  * cells would lose. */
class StatChecksSpec extends SparkTestBase {

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- correlations ---

  private def corrFixture: DataFrame = {
    import spark.implicits._
    // a: 1..200; b = 3a+7 (r=1); c = −2a (r=−1); d: nulls on %5, NaN on
    // %7 — pairwise exclusion must drop exactly those rows per pair.
    (1 to 200).map { i =>
      val d: java.lang.Double =
        if (i % 5 == 0) null
        else if (i % 7 == 0) java.lang.Double.NaN
        else (i % 13).toDouble * 2.5
      (i.toDouble, 3.0 * i + 7.0, -2.0 * i, d)
    }.toDF("a", "b", "c", "d").repartition(8)
  }

  private def plainPearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("correlations: exact ±1 on linear pairs, plain-Scala match on the rest") {
    val got = Profiler.correlations(corrFixture, Seq("a", "b", "c", "d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == ((200L, Some(1.0))))
    assert(got(("a", "c")) == ((200L, Some(-1.0))))
    assert(got(("b", "c")) == ((200L, Some(-1.0))))
    // pairwise-complete: d drops %5 (null) and %7 (NaN) rows only
    val kept = (1 to 200).filterNot(i => i % 5 == 0 || i % 7 == 0)
    val (n, rAd) = got(("a", "d"))
    assert(n == kept.size)
    val want = plainPearson(kept.map(_.toDouble),
      kept.map(i => (i % 13).toDouble * 2.5))
    assert(rAd.contains(round6(want)), s"a~d: ${rAd} != ${round6(want)}")
  }

  test("correlations: constant column yields null, not NaN") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toDouble, 4.2)).toDF("x", "k")
    val r = Profiler.correlations(df, Seq("x", "k")).collect().head
    assert(r.getLong(2) == 50 && r.isNullAt(3))
  }

  // --- benford ---

  test("benford: log-uniform sample passes, flat-digit sample fails") {
    import spark.implicits._
    // 4096 points of 10^(i/4096) ∈ [1, 10): first digits follow Benford
    // by construction (measure of [d, d+1) on the log scale).
    val conforming = (0 until 4096).map(i =>
      math.pow(10.0, i / 4096.0)).toDF("v")
    val pass = StatChecks.benford(conforming, "v").collect()
    assert(pass.length == 9)
    assert(pass.forall(_.getBoolean(6)),
      s"log-uniform sample failed: stat=${pass.head.getDouble(5)}")
    // digit counts: floor(4096·log10(1+1/d)) ± 1 of expectation
    pass.foreach { r =>
      val d = r.getInt(0)
      val exp = 4096.0 * math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getLong(1) - exp) <= 1.0, s"digit $d: ${r.getLong(1)} vs $exp")
    }

    // 900 values with flat first digits (100 each): chi² = Σ(100−n·p)²/(n·p)
    val flat = (1 to 9).flatMap(d => Seq.fill(100)(d * 10.0 + 3.0)).toDF("v")
    val fail = StatChecks.benford(flat, "v").collect()
    val wantStat = (1 to 9).map { d =>
      val e = 900.0 * math.log10(1.0 + 1.0 / d)
      (100.0 - e) * (100.0 - e) / e
    }.sum
    assert(fail.forall(!_.getBoolean(6)), "flat digits must fail Benford")
    assert(fail.head.getDouble(5) == round6(wantStat))
  }

  test("benford: sub-1 / null / non-finite values are excluded, zero-count digits kept") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.5, 0.3, null, Double.PositiveInfinity,
      Double.NaN, 150.0, 19.0, -22.0).toDF("v")
    val got = StatChecks.benford(df, "v").collect()
    // counted: 1.5, 150.0, 19.0 → digit 1 (×3); |−22| → digit 2
    assert(got.length == 9)
    assert(got.map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      (1 to 9).map(d => d -> (if (d == 1) 3L else if (d == 2) 1L else 0L)).toMap)
  }

  // --- independence ---

  test("independence: product table passes with stat 0, diagonal fails") {
    import spark.implicits._
    // perfectly independent: every (x, y) combo appears x_weight·y_weight
    val indep = (for {
      (xv, xw) <- Seq(("a", 1), ("b", 2), ("c", 3))
      (yv, yw) <- Seq(("p", 2), ("q", 5))
      _ <- 1 to (xw * yw * 4)
    } yield (xv, yv)).toDF("x", "y").repartition(8)
    val p = StatChecks.independence(indep, "x", "y", critical = 5.991)
    val pr = p.collect()
    assert(pr.length == 6)
    assert(pr.forall(r => r.getDouble(5) == 0.0 && r.getBoolean(7)))
    assert(pr.forall(_.getLong(6) == 2L)) // dof = (3−1)(2−1)

    // fully coupled: x determines y; the (a,q)/(b,p) cells are
    // UNOBSERVED but still contribute their expected counts.
    val dep = (Seq.fill(30)(("a", "p")) ++ Seq.fill(20)(("b", "q")))
      .toDF("x", "y").repartition(4)
    val d = StatChecks.independence(dep, "x", "y", critical = 3.841).collect()
    assert(d.length == 4, "unobserved grid cells must be materialized")
    // plain chi²: margins 30/20 × 30/20, n=50 → stat = n = 50
    val wantStat = {
      val cells = Seq((30.0, 30.0, 30.0), (30.0, 20.0, 0.0),
        (20.0, 30.0, 0.0), (20.0, 20.0, 20.0))
      cells.map { case (rt, ct, o) =>
        val e = rt * ct / 50.0; (o - e) * (o - e) / e
      }.sum
    }
    assert(d.head.getDouble(5) == round6(wantStat))
    assert(d.forall(!_.getBoolean(7)))
    assert(d.forall(_.getLong(6) == 1L))
  }
}
