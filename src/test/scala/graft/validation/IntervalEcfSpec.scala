package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Intervals.validity]] vs hand-built timelines (incl. the nested
  * interval a lag-based check would miss) and [[StatChecks.ecfTwoSample]]
  * vs plain-Scala moments with planted shift / identical distributions. */
class IntervalEcfSpec extends SparkTestBase {

  import spark.implicits._

  // ---------------- intervals ----------------

  private def run(rows: Seq[(String, Long, Long, Long)], gapTolUs: Long = 100L) =
    Intervals.validity(
      rows.toDF("k", "f", "t", "id"), "k", "f", "t", "id", gapTolUs)
      .collect().map(r => r.getString(0) -> r).toMap

  test("overlap, gap, back-to-back, invalid, and single-interval keys") {
    val got = run(Seq(
      // healthy: back-to-back (gap 0) then small tolerated gap (50)
      ("ok", 0L, 100L, 1L), ("ok", 100L, 200L, 2L), ("ok", 250L, 300L, 3L),
      // overlap by 30
      ("ov", 0L, 100L, 1L), ("ov", 70L, 150L, 2L),
      // gap of 500 > tol 100
      ("gap", 0L, 100L, 1L), ("gap", 600L, 700L, 2L),
      // invalid: to < from (still must not crash the sweep)
      ("inv", 100L, 50L, 1L), ("inv", 150L, 200L, 2L),
      // single interval: trivially consistent
      ("one", 0L, 10L, 1L)))
    assert(got("ok").getAs[Boolean]("pass"))
    assert(got("ok").getAs[Long]("n_overlaps") === 0L)
    assert(got("ok").getAs[Long]("n_gaps") === 0L)
    assert(got("ov").getAs[Long]("n_overlaps") === 1L)
    assert(got("ov").getAs[Long]("max_overlap_us") === 30L)
    assert(!got("ov").getAs[Boolean]("pass"))
    assert(got("gap").getAs[Long]("n_gaps") === 1L)
    assert(got("gap").getAs[Long]("max_gap_us") === 500L)
    assert(got("inv").getAs[Long]("n_invalid") === 1L)
    assert(!got("inv").getAs[Boolean]("pass"))
    assert(got("one").getAs[Boolean]("pass"))
    assert(got("one").getAs[Long]("n_intervals") === 1L)
  }

  test("nested interval overlaps a LATER row — running max catches what lag misses") {
    // long [0,1000] covers both later rows; the immediate-predecessor
    // check between rows 2 and 3 sees no overlap (200..300 vs 400..500),
    // so lag(to) would count 1 overlap; the sweep counts 2.
    val got = run(Seq(
      ("k", 0L, 1000L, 1L), ("k", 200L, 300L, 2L), ("k", 400L, 500L, 3L)))
    assert(got("k").getAs[Long]("n_overlaps") === 2L)
    assert(got("k").getAs[Long]("max_overlap_us") === 800L)
  }

  test("tie order is deterministic: same from, ordered by to then id") {
    val got = run(Seq(
      ("k", 0L, 50L, 2L), ("k", 0L, 100L, 1L), ("k", 100L, 150L, 3L)))
    // sorted: (0,50),(0,100),(100,150) → first pair overlaps by 50,
    // third row starts exactly at running max 100 → no gap, no overlap
    assert(got("k").getAs[Long]("n_overlaps") === 1L)
    assert(got("k").getAs[Long]("max_overlap_us") === 50L)
    assert(got("k").getAs[Long]("n_gaps") === 0L)
  }

  // ---------------- ECF two-sample ----------------

  private val freqs = Seq(0.5, 1.0, 1.5, 2.0)

  test("ECF statistic matches plain-Scala moments and flags a planted shift") {
    val a = (0 until 400).map(i => (i * 0.01, true))          // U[0,4)
    val b = (0 until 400).map(i => (i * 0.01 + 2.0, false))   // U[2,6)
    val df = (a ++ b).toDF("v", "g")
    val rows = StatChecks.ecfTwoSample(df, "v", "g", scale = 1.0, freqs)
      .collect()
    assert(rows.length === freqs.size)
    val stat = rows.head.getAs[Double]("ecf_stat")
    // independent recomputation
    val want = freqs.map { f =>
      def m(xs: Seq[Double], fn: Double => Double) = xs.map(fn).sum / xs.size
      val (xa, xb) = (a.map(_._1), b.map(_._1))
      math.pow(m(xa, x => math.cos(f * x)) - m(xb, x => math.cos(f * x)), 2) +
        math.pow(m(xa, x => math.sin(f * x)) - m(xb, x => math.sin(f * x)), 2)
    }.sum
    assert(math.abs(stat - want) < 1e-6)
    assert(rows.forall(_.getAs[Boolean]("reject")), "2-unit shift must reject")
    // per-frequency components match too
    rows.zip(freqs).foreach { case (r, f) =>
      assert(r.getAs[Double]("freq") === f)
      val xa = a.map(_._1)
      assert(math.abs(r.getAs[Double]("re_a") -
        xa.map(x => math.cos(f * x)).sum / xa.size) < 1e-6)
    }
  }

  test("ECF accepts identical distributions and excludes non-finite rows") {
    val a = (0 until 300).map(i => (i * 0.01, true))
    val b = (0 until 300).map(i => (i * 0.01, false))
    val noise = Seq((Double.NaN, true), (Double.PositiveInfinity, false))
    val rows = StatChecks.ecfTwoSample((a ++ b ++ noise).toDF("v", "g"),
      "v", "g", scale = 1.0, freqs).collect()
    assert(rows.head.getAs[Long]("n_a") === 300L)
    assert(rows.head.getAs[Long]("n_b") === 300L)
    assert(rows.head.getAs[Double]("ecf_stat") === 0.0)
    assert(rows.forall(!_.getAs[Boolean]("reject")))
  }

  test("ECF detects a pure SCALE change at equal means (where a mean gate is blind)") {
    // same mean 0, different spread: N-ish symmetric triangle vs wide
    val a = (-200 to 200).map(i => (i * 0.005, true))    // U[-1,1]
    val b = (-200 to 200).map(i => (i * 0.02, false))    // U[-4,4]
    val rows = StatChecks.ecfTwoSample((a ++ b).toDF("v", "g"),
      "v", "g", scale = 1.0, freqs).collect()
    assert(rows.head.getAs[Double]("ecf_stat") >
      rows.head.getAs[Double]("critical"))
  }
}
