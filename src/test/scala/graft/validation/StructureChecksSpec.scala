package graft.validation

import graft.SparkTestBase

/** Mask profiling, Theil–Sen trend, and ECOD outliers pinned against
  * plain-Scala recomputation on planted data: known mask structures with
  * a malformed minority, a linear metric series with one corrupted run
  * (the robustness claim, checked against what OLS would do), and a
  * planted extreme point that must take the top ECOD score. */
class StructureChecksSpec extends SparkTestBase {

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- mask profiling ---

  test("masks: class substitution, run collapse, variant counting, coverage") {
    import spark.implicits._
    // 60 phone-shaped, 30 code-shaped (two run-length variants of the
    // same compressed mask), 9 word, 1 malformed — plus a null.
    val rows =
      (1 to 60).map(i => f"+1-555-$i%04d") ++
      (1 to 20).map(i => f"AB-$i%03d") ++
      (1 to 10).map(i => f"ABC-$i%02d") ++
      (1 to 9).map(_ => "hello") ++
      Seq("??!") ++ Seq(null)
    val df = rows.toDF("s").repartition(4)
    val got = MaskProfile.masks(df, "s", topK = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // expected compressed masks: "+9-9-9" 60, "A-9" 30 (2 full variants),
    // "a" 9, "??!" 1 — 100 non-null rows total.
    assert(got.length == 4)
    assert(got(0) == ((1, "+9-9-9", 60L, 1L, 0.6, 0.6)))
    assert(got(1) == ((2, "A-9", 30L, 2L, 0.3, 0.9)))
    assert(got(2) == ((3, "a", 9L, 1L, 0.09, 0.99)))
    assert(got(3) == ((4, "??!", 1L, 1L, 0.01, 1.0)))
  }

  test("masks: topK cut is deterministic under count ties (mask tiebreak)") {
    import spark.implicits._
    val df = Seq("aa", "99", "AA", "--").toDF("s")
    val got = MaskProfile.masks(df, "s", topK = 2).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    // all four masks have count 1; ties break on the mask string
    // ascending ("--" < "9" < "A" < "a" in ASCII), so the cut is stable.
    assert(got.toSeq == Seq((1, "--"), (2, "9")))
  }

  // --- Theil–Sen ---

  test("theilSen: exact slope/intercept on a clean linear series") {
    import spark.implicits._
    // metric = 10 + 2*seq over 6 runs: every pairwise slope is exactly 2.
    val hist = (1 to 6).map(i => (f"r$i%02d", "m", 10.0 + 2.0 * i))
      .toDF("run_id", "check", "metric")
    val got = MetricTrend.theilSen(hist, slopeTol = 0.01).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "m")
    assert(r.getLong(1) == 6L && r.getLong(2) == 15L)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 10.0)
    assert(r.getBoolean(5))
  }

  test("theilSen: one corrupted run cannot tilt the slope (OLS would)") {
    import spark.implicits._
    // flat series at 5.0 except one wild run — Theil–Sen slope stays 0,
    // while the OLS slope on the same series is far from 0.
    // spike OFF-center — a centered spike is symmetric and OLS-invisible
    val ys = Seq(5.0, 5.0, 5.0, 5.0, 5.0, 500.0, 5.0)
    val hist = ys.zipWithIndex.map { case (y, i) => (f"r$i%02d", "m", y) }
      .toDF("run_id", "check", "metric")
    val got = MetricTrend.theilSen(hist, slopeTol = 0.01).collect()(0)
    assert(got.getDouble(3) == 0.0)
    assert(!got.getBoolean(5))
    // independent OLS recomputation to justify the robustness claim
    val n = ys.size.toDouble
    val xs = (1 to ys.size).map(_.toDouble)
    val olsSlope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(olsSlope) > 1.0)
  }

  test("theilSen: median interpolation matches plain-Scala on an even pair count") {
    import spark.implicits._
    val ys = Seq(1.0, 2.0, 4.0, 9.0)
    val hist = ys.zipWithIndex.map { case (y, i) => (f"r$i%02d", "m", y) }
      .toDF("run_id", "check", "metric")
    val got = MetricTrend.theilSen(hist, slopeTol = 100.0).collect()(0)
    val slopes = (for {
      j <- ys.indices; i <- 0 until j
    } yield (ys(j) - ys(i)) / (j - i).toDouble).sorted
    val med = (slopes(slopes.size / 2 - 1) + slopes(slopes.size / 2)) / 2.0
    assert(got.getDouble(3) == round6(med))
    assert(!got.getBoolean(5))
  }

  // --- ECOD ---

  test("ecod: planted extreme point takes the top score; score matches plain Scala") {
    import spark.implicits._
    val base = (1 to 99).map(i => (i.toLong, (i % 10).toDouble, (i % 7).toDouble))
    val rows = base :+ ((100L, 1000.0, 6.0))
    val df = rows.toDF("id", "x", "y").repartition(4)
    val got = StatChecks.ecodOutliers(df, Seq("x", "y"), Seq("id"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 100L)
    // plain-Scala recomputation of row 100's score
    def score(vs: Seq[Double], v: Double): Double = {
      val n = vs.size.toDouble
      val fle = vs.count(_ <= v) / n
      val fge = vs.count(_ >= v) / n
      -math.log(math.min(fle, fge))
    }
    val xs = rows.map(_._2); val ys = rows.map(_._3)
    val expected = round6(score(xs, 1000.0) + score(ys, 6.0))
    assert(got.head._2 == expected)
    // descending scores with deterministic output
    assert(got.map(_._2).sameElements(got.map(_._2).sortBy(-_)))
  }

  test("ecod grid rung: planted extreme still ranks first; score matches the grid formula") {
    import spark.implicits._
    val base = (1 to 99).map(i => (i.toLong, (i % 10).toDouble, (i % 7).toDouble))
    // extreme in BOTH dims: a grid ECDF saturates each tail at
    // 1/(gridN+1) by construction, so a row at a single data extreme
    // TIES the planted monster on that margin — only the joint
    // extremity is strictly separable at grid resolution. (The exact
    // rung has no such floor; the agreement check below still sees the
    // x-margin alone dominate.)
    val rows = base :+ ((100L, 1000.0, 1000.0))
    val df = rows.toDF("id", "x", "y").repartition(4)
    val gridN = 15
    val got = StatChecks.ecodOutliersGrid(df, Seq("x", "y"), Seq("id"),
        gridN = gridN, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 100L)
    // plain-Scala recomputation: exact-percentile grid (linear
    // interpolation, Spark's definition), round-6 breakpoints, floored
    // tail counts.
    def grid(vs: Seq[Double]): Seq[Double] = {
      val s = vs.sorted
      (1 to gridN).map { i =>
        val pos = (i.toDouble / (gridN + 1)) * (s.size - 1)
        val (lo, hi) = (pos.toInt, math.min(pos.toInt + 1, s.size - 1))
        val d = pos - lo
        round6(s(lo) + d * (s(hi) - s(lo)))
      }
    }
    def score(g: Seq[Double], v: Double): Double = {
      val le = math.max(g.count(_ <= v), 1).toDouble / (gridN + 1)
      val ge = math.max(g.count(_ >= v), 1).toDouble / (gridN + 1)
      -math.log(math.min(le, ge))
    }
    val (xs, ys) = (rows.map(_._2), rows.map(_._3))
    val (gx, gy) = (grid(xs), grid(ys))
    val expected = rows.map(r => r._1 -> round6(score(gx, r._2) + score(gy, r._3))).toMap
    got.foreach { case (id, sc) => assert(sc == expected(id), s"row $id") }
    // both rungs agree on WHO the top outlier is
    val exactTop = StatChecks.ecodOutliers(df, Seq("x", "y"), Seq("id"), topK = 1)
      .collect()(0).getLong(0)
    assert(exactTop == 100L)
  }

  test("ecod: rows with null or non-finite dimensions are excluded") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 1.0), (2L, 2.0, null), (3L, Double.NaN, 3.0),
      (4L, 4.0, 4.0), (5L, Double.PositiveInfinity, 5.0))
      .toDF("id", "x", "y")
    val got = StatChecks.ecodOutliers(df, Seq("x", "y"), Seq("id"), topK = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }
}
