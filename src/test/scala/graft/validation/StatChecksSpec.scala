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

  test("spearman: monotone-nonlinear reads ±1, leverage point barely moves it, ties average") {
    import spark.implicits._
    // y = x³ is monotone but nonlinear: Pearson < 1, Spearman = 1.
    // z has ONE 10^9 leverage point at the smallest x: Pearson(x, z)
    // gets dragged hard; Spearman moves by ~1/n.
    val n = 100
    val rows = (1 to n).map { i =>
      val z = if (i == 1) 1e9 else i.toDouble
      (i.toDouble, math.pow(i.toDouble, 3), z, (i % 4).toDouble)
    }
    val df = rows.toDF("x", "y", "z", "t").repartition(8)
    val s = Profiler.spearman(df, Seq("x", "y", "z", "t")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    val p = Profiler.correlations(df, Seq("x", "y", "z", "t")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(s(("x", "y")).contains(1.0), "monotone cube must be Spearman 1")
    assert(p(("x", "y")).get < 0.95, "cube is not Pearson-linear")
    // leverage point: z is x with rank 1 moved to rank 100
    assert(p(("x", "z")).get < 0.1, "one monster point wrecks Pearson")
    assert(s(("x", "z")).get > 0.88, s"Spearman must shrug it off: ${s(("x", "z"))}")
    // tie handling: recompute Spearman(x, t) via plain average ranks
    def avgRanks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val lo = sorted.indexOf(v) + 1; val cnt = sorted.count(_ == v)
        (2.0 * lo + cnt - 1) / 2.0
      }
    }
    val rx = avgRanks(rows.map(_._1)); val rt = avgRanks(rows.map(_._4))
    assert(s.get(("t", "x")).flatten.orElse(s.get(("x", "t")).flatten)
      .contains(round6(plainPearson(rx, rt))))
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

  // --- mutual information / Cramér's V ---

  test("mutualInfo: 0 on a product table, ln(2) and V=1 on a diagonal one") {
    import spark.implicits._
    val indep = (for {
      (xv, xw) <- Seq(("a", 1), ("b", 3)); (yv, yw) <- Seq(("p", 2), ("q", 1))
      _ <- 1 to (xw * yw * 5)
    } yield (xv, yv)).toDF("x", "y")
    val i = StatChecks.mutualInfo(indep, "x", "y").collect().head
    assert(i.getDouble(5) == 0.0 && i.getDouble(6) == 0.0) // V = 0, MI = 0

    // x ↔ y bijection with equal masses: MI = H(X) = ln 2, V = 1
    val dep = (Seq.fill(25)(("a", "p")) ++ Seq.fill(25)(("b", "q")))
      .toDF("x", "y")
    val d = StatChecks.mutualInfo(dep, "x", "y").collect().head
    assert(d.getLong(0) == 50 && d.getLong(3) == 1)
    assert(d.getDouble(4) == 50.0)                // chi² = n·φ² = n
    assert(d.getDouble(5) == 1.0)                 // Cramér's V
    assert(d.getDouble(6) == round6(math.log(2.0))) // MI = H(X)
  }

  // --- exact two-sample KS ---

  test("ksTwoSample: plain-Scala ECDF match, shift rejects, same-dist accepts") {
    import spark.implicits._
    // A: 1..300; B: A + 40 on the %3 split — a real location shift
    val rows = (1 to 900).map { i =>
      val g = i % 3 == 0
      val v = if (g) (i % 300) + 1.0 else (i % 300) + 41.0
      (v, g)
    }
    val df = rows.toDF("v", "g").repartition(8)
    val got = StatChecks.ksTwoSample(df, "v", "g").collect().head

    // plain-Scala exact D over the pooled distinct values
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    val pooled = (a ++ b).distinct.sorted
    val wantD = pooled.map { t =>
      math.abs(a.count(_ <= t).toDouble / a.size -
        b.count(_ <= t).toDouble / b.size)
    }.max
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(got.getDouble(2) == round6(wantD))
    assert(got.getBoolean(5), "location shift must reject")
    // ks_at attains the sup
    val at = got.getDouble(3)
    val dAt = math.abs(a.count(_ <= at).toDouble / a.size -
      b.count(_ <= at).toDouble / b.size)
    assert(round6(dAt) == got.getDouble(2))

    // identical distributions: D small, not rejected
    val same = (1 to 900).map(i => ((i % 300) + 1.0, i % 2 == 0)).toDF("v", "g")
    val s = StatChecks.ksTwoSample(same, "v", "g").collect().head
    assert(s.getDouble(2) <= 0.01 && !s.getBoolean(5))
  }

  // --- robust outliers (median/MAD) ---

  test("robustOutliers: Hampel rule flags the planted tail, immune to the outliers themselves") {
    import spark.implicits._
    // 97 inliers around 100 (median 100, MAD 2) + 3 monsters. The
    // monsters shift a mean/σ gate's own baseline; median/MAD ignore
    // them entirely.
    val inliers = (1 to 97).map(i => 98.0 + (i % 5)) // {98..102}
    val vals = inliers ++ Seq(1e9, -1e9, 5000.0)
    val got = StatChecks.robustOutliers(vals.toDF("v"), "v", k = 3.5)
      .collect().head
    val sorted = vals.sorted
    def q50(xs: Seq[Double]): Double = { // linear interpolation, as both engines
      val s = xs.sorted; val idx = 0.5 * (s.size - 1)
      val lo = s(idx.toInt); val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val med = q50(vals)
    val mad = q50(vals.map(v => math.abs(v - med)))
    assert(got.getLong(0) == 100)
    assert(got.getDouble(1) == round6(med) && got.getDouble(2) == round6(mad))
    val wantOut = vals.count(v => round6(math.abs(v - med) / mad) > 3.5)
    assert(got.getLong(3) == wantOut && wantOut == 3,
      s"expected exactly the 3 planted monsters, got ${got.getLong(3)}")
    assert(got.getDouble(4) == round6(vals.map(v => math.abs(v - med) / mad).max))
  }

  test("robustOutliers: mad = 0 degenerates to zero flags, not divide-by-zero") {
    import spark.implicits._
    val vals = Seq.fill(60)(7.0) ++ Seq(1e6, -5.0) // >50% identical
    val got = StatChecks.robustOutliers(vals.toDF("v"), "v").collect().head
    assert(got.getDouble(2) == 0.0 && got.getLong(3) == 0L && got.isNullAt(4))
  }

  // --- timeliness ---

  test("freshness: stale segment, gap segment, healthy segment, single-event segment") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")
    val rows =
      (1 to 10).map(d => ("healthy", ts(d, 12))) ++           // daily, last 3-10
      (1 to 5).map(d => ("stale", ts(d, 0))) ++               // stops on 3-05
      (Seq(1, 2, 8, 9).map(d => ("gappy", ts(d, 0)))) ++      // 6-day hole
      Seq(("single", ts(9, 0)))
    val got = Timeliness.freshness(rows.toDF("seg", "ts"), "ts", "seg",
        "2024-03-11 00:00:00", maxLagHours = 48.0, maxGapHours = 30.0)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5), r.getBoolean(6),
          r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(got.size == 4)
    // healthy: last 3-10 12:00 → 12h stale (≤48), max gap 24h (≤30)
    assert(got("healthy") == ((10L, 12.0, 24.0, true, true, true)))
    // stale: last 3-05 → 144h
    assert(got("stale") == ((5L, 144.0, 24.0, false, true, false)))
    // gappy: fresh enough (last 3-09 → 48h) but a 144h arrival hole
    assert(got("gappy") == ((4L, 48.0, 144.0, true, false, false)))
    // single event: gap 0 by definition
    assert(got("single") == ((1L, 48.0, 0.0, true, true, true)))
  }

  test("ksTwoSample is the oracle for the t-digest sketch KS") {
    import graft.sketch.TDigest
    // planted shift: exact D = 0.2 by construction (20% of mass moved)
    val aVals = (1 to 1000).map(_.toDouble)
    val bVals = (1 to 1000).map(i => if (i <= 800) i.toDouble else i + 5000.0)
    import spark.implicits._
    val df = (aVals.map((_, true)) ++ bVals.map((_, false))).toDF("v", "g")
    val exact = StatChecks.ksTwoSample(df, "v", "g").collect().head.getDouble(2)

    val ta = new TDigest(100.0); aVals.foreach(v => ta.add(v))
    val tb = new TDigest(100.0); bVals.foreach(v => tb.add(v))
    val sketch = TDigest.ks(ta, tb)
    assert(math.abs(sketch - exact) <= 0.03,
      s"sketch KS $sketch vs exact $exact drifted beyond tolerance")
  }
}
