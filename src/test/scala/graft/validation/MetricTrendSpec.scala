package graft.validation

import graft.SparkTestBase

/** EWMA control chart vs a plain-Scala recomputation of the closed form,
  * plus the chart's defining behaviors: a small persistent shift is
  * caught (where pairwise anomaly deltas would stay under threshold),
  * a constant series never alarms (σ=0 edge), and a single-run history
  * degrades gracefully (σ undefined → no alarm).
  */
class MetricTrendSpec extends SparkTestBase {

  private def historyDf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("run_id", "check", "metric")
  }

  // 12 runs: 8 at ~1.0 with tiny noise, then a persistent +0.4σ-ish
  // shift of +0.02 — small enough that no single-step delta looks odd.
  private val shifted: Seq[(String, String, Double)] =
    (1 to 12).map { i =>
      val base = if (i <= 8) 1.0 + (if (i % 2 == 0) 0.005 else -0.005)
                 else 1.02
      (f"r$i%02d", "m_shift", base)
    }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def plainEwma(ms: Seq[Double], lam: Double, l: Double, b: Int)
      : Seq[(Double, Double, Boolean)] = {
    // Phase-I: μ0/σ from the first b (in-control) runs only.
    val base = ms.take(b)
    val n = base.size
    // mirror the engine's decimal(28,12) cast (HALF_UP at 12 places)
    def d12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sm = base.map(d12).sum.toDouble
    val sm2 = base.map(m => d12(m * m)).sum.toDouble
    val mu0 = sm / n
    val sigma = if (n > 1)
      math.sqrt(math.max(0.0, (sm2 - sm * sm / n) / (n - 1.0))) else 0.0
    ms.zipWithIndex.map { case (_, idx) =>
      val i = idx + 1
      val wsum = (1 to i).map(j => math.pow(1.0 - lam, i - j) * ms(j - 1)).sum
      val z = lam * wsum + math.pow(1.0 - lam, i) * mu0
      val half = l * sigma *
        math.sqrt(lam / (2.0 - lam) * (1.0 - math.pow(1.0 - lam, 2.0 * i)))
      (z, half, round6(math.abs(z - mu0)) > round6(half))
    }
  }

  test("ewma matches the closed-form recomputation and flags the shift") {
    val got = MetricTrend.ewma(historyDf(shifted), lam = 0.3, l = 3.0,
        baselineRuns = 8)
      .collect()
      .map(r => (r.getString(1), r.getDouble(4), r.getBoolean(7)))
    val ms = shifted.map(_._3)
    val want = plainEwma(ms, 0.3, 3.0, 8)
    got.zip(want).zipWithIndex.foreach { case (((rid, z, out), (wz, _, wout)), i) =>
      assert(z == round6(wz), s"run $rid ($i): ewma $z != ${round6(wz)}")
      assert(out == wout, s"run $rid ($i): out_of_control $out != $wout")
    }
    // the persistent small shift IS caught (in the tail runs)...
    assert(got.drop(9).exists(_._3), "shift never alarmed")
    // ...and the stable head is quiet.
    assert(got.take(8).forall(!_._3), "false alarm in the stable head")
  }

  test("pairwise anomaly detection misses the same shift") {
    // Every consecutive delta is <= 0.025 — under a 0.05 relative gate —
    // which is exactly why the sequential chart exists.
    val deltas = shifted.map(_._3).sliding(2).map(p => (p(1) - p(0)).abs)
    assert(deltas.forall(_ <= 0.025 + 1e-12))
  }

  test("constant series never alarms (sigma = 0 edge)") {
    val flat = (1 to 6).map(i => (f"r$i%02d", "m_flat", 0.75))
    val got = MetricTrend.ewma(historyDf(flat), lam = 0.3, l = 3.0,
      baselineRuns = 6).collect()
    assert(got.length == 6)
    assert(got.forall(!_.getBoolean(7)))
  }

  test("single-run history degrades gracefully") {
    val one = MetricTrend.ewma(historyDf(Seq(("r01", "m_one", 2.0))),
      lam = 0.3, l = 3.0, baselineRuns = 4).collect()
    assert(one.length == 1)
    assert(one.head.getDouble(4) == 2.0) // z_1 = λm + (1−λ)μ0 = m when n=1
    assert(!one.head.getBoolean(7))
  }

  // --- CUSUM ---

  /** Page's recursion directly: U_i = max(0, U_{i−1} + (m_i − μ0 − kσ)),
    * L_i = max(0, L_{i−1} + (μ0 − kσ − m_i)) — the engine computes the
    * prefix-sum/prefix-min closed form; equality here proves the
    * closed form IS the recursion. */
  private def plainCusum(ms: Seq[Double], k: Double, h: Double, b: Int)
      : Seq[(Double, Double, Double, Boolean)] = {
    val base = ms.take(b)
    val n = base.size
    def d12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sm = base.map(d12).sum.toDouble
    val sm2 = base.map(m => d12(m * m)).sum.toDouble
    val mu0 = sm / n
    val sigma = if (n > 1)
      math.sqrt(math.max(0.0, (sm2 - sm * sm / n) / (n - 1.0))) else 0.0
    val thr = h * sigma
    var (u, lo) = (0.0, 0.0)
    ms.map { m =>
      u = math.max(0.0, u + (m - mu0 - k * sigma))
      lo = math.max(0.0, lo + (mu0 - k * sigma - m))
      (u, lo, thr, round6(u) > round6(thr) || round6(lo) > round6(thr))
    }
  }

  test("cusum closed form matches Page's recursion and flags the shift") {
    val got = MetricTrend.cusum(historyDf(shifted), k = 0.5, h = 4.0,
        baselineRuns = 8).collect()
      .map(r => (r.getString(1), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getBoolean(7)))
    val want = plainCusum(shifted.map(_._3), 0.5, 4.0, 8)
    got.zip(want).zipWithIndex.foreach {
      case (((rid, hi, lo, thr, out), (whi, wlo, wthr, wout)), i) =>
        assert(hi == round6(whi), s"run $rid ($i): cusum_hi $hi != ${round6(whi)}")
        assert(lo == round6(wlo), s"run $rid ($i): cusum_lo $lo != ${round6(wlo)}")
        assert(thr == round6(wthr), s"run $rid ($i): threshold $thr != ${round6(wthr)}")
        assert(out == wout, s"run $rid ($i): out_of_control $out != $wout")
    }
    // the +0.02 shift (≈3.7σ of the ±0.005 baseline) accumulates
    // linearly and trips h·σ within the 4 post-shift runs...
    assert(got.drop(8).exists(_._5), "cusum never alarmed after the shift")
    // ...while the alternating in-control head stays at zero-ish sums.
    assert(got.take(8).forall(!_._5), "false alarm in the stable head")
  }

  test("cusum: constant series stays at exactly zero") {
    val flat = (1 to 6).map(i => (f"r$i%02d", "m_flat", 0.75))
    val got = MetricTrend.cusum(historyDf(flat), k = 0.5, h = 4.0,
      baselineRuns = 6).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
      assert(!r.getBoolean(7))
    }
  }

  test("cusum resets after a transient excursion") {
    // one spike inside an otherwise flat tail: the sum decays back by
    // k·σ per run (EWMA would keep a geometric residue much longer).
    // baseline: μ0 = 1.0, σ ≈ 0.00756 → kσ ≈ 0.00378, hσ ≈ 0.0302;
    // the 1.05 spike puts U at 0.0462 (alarm), then 13 flat runs drain
    // it at kσ per run back to exactly max(0, ...) = 0.
    val ms = Seq(1.0, 1.01, 0.99, 1.0, 1.01, 0.99, 1.0, 1.0) ++
      Seq(1.05) ++ Seq.fill(13)(1.0)
    val rows = ms.zipWithIndex.map { case (m, i) => (f"r${i + 1}%02d", "m_t", m) }
    val got = MetricTrend.cusum(historyDf(rows), k = 0.5, h = 4.0,
      baselineRuns = 8).collect()
    val want = plainCusum(ms, 0.5, 4.0, 8)
    got.zip(want).foreach { case (r, (whi, _, _, wout)) =>
      assert(r.getDouble(4) == round6(whi))
      assert(r.getBoolean(7) == wout)
    }
    // the spike run alarms, and the sum has fully decayed by the tail
    assert(got(8).getBoolean(7), "spike run did not alarm")
    assert(got.last.getDouble(4) == 0.0, "cusum_hi failed to reset after the excursion")
  }
}
