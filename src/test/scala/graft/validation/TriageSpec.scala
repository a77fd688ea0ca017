package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The violation-triage surfaces: bounded per-check examples (two-stage
  * distributed top-k) and the Wilson sample estimate. Both are
  * hash-verified against generated DuckDB twins (`q_v_examples`,
  * `q_v_estimate`); these tests pin the semantics against plain-Scala
  * recomputation on planted data — exact top-k membership and ranks
  * under a many-partition layout (so the two-stage pre-rank is actually
  * exercised), and the Wilson bounds against a direct formula
  * evaluation plus their coverage/monotonicity properties.
  */
class TriageSpec extends SparkTestBase {

  private val suite = CheckSuite(Seq(
    Complete("opt", 1.0),
    InRange("v", 0.0, 100.0, 1.0),
    Matches("tag", "^ok", 1.0)))

  /** 400 rows over 16 partitions; violations planted deterministically:
    * opt null on id%7==0, v out of range on id%5==0, tag bad on id%3==0. */
  private def fixture: DataFrame = {
    import spark.implicits._
    (1L to 400L).map { id =>
      (id,
        if (id % 7 == 0) None else Some("x"),
        if (id % 5 == 0) -1.0 else 10.0,
        if (id % 3 == 0) "bad" else "ok")
    }.toDF("id", "opt", "v", "tag").repartition(16)
  }

  test("exampleViolations = per-check first-k failing keys, exact ranks") {
    val got = suite.exampleViolations(fixture, Seq("id"), k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))

    def firstK(mod: Long): Seq[Long] = (1L to 400L).filter(_ % mod == 0).take(5)
    val want =
      firstK(7).zipWithIndex.map { case (id, i) => ("complete_opt", id, i + 1) } ++
      firstK(5).zipWithIndex.map { case (id, i) => ("range_v", id, i + 1) } ++
      firstK(3).zipWithIndex.map { case (id, i) => ("matches_tag", id, i + 1) }
    assert(got.toSeq == want.sortBy(r => (r._1, r._2)))
  }

  test("exampleViolations caps at k even when a check fails everywhere") {
    val all = CheckSuite(Seq(Satisfies("never", "v < -1e9", 1.0)))
    val rows = all.exampleViolations(fixture, Seq("id"), k = 3).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("estimate matches a direct Wilson evaluation on the sampled slice") {
    val got = suite.estimate(fixture, "id", Seq("0", "1"), maxViolRate = 0.15)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getBoolean(6)))).toMap

    // Recompute the deterministic sample + counters in plain Scala.
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char = {
      val h = md.digest(s.getBytes("UTF-8"))
      "0123456789abcdef".charAt((h(0) >> 4) & 0xf)
    }
    val sampled = (1L to 400L).filter(id => "01".contains(hex1(id.toString)))
    val n = sampled.size.toDouble
    def wilson(x: Long): (Double, Double, Double, Double) = {
      val phat = x / n
      val denom = 1.0 + 3.8416 / n
      val center = (phat + 3.8416 / (2.0 * n)) / denom
      val half = 1.96 * math.sqrt(phat * (1.0 - phat) / n +
        3.8416 / (4.0 * n * n)) / denom
      (phat, math.max(0.0, center - half), math.min(1.0, center + half),
        math.min(1.0, center + half))
    }
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((label, mod) <- Seq(("complete_opt", 7L), ("range_v", 5L),
        ("matches_tag", 3L))) {
      val x = sampled.count(_ % mod == 0).toLong
      val (phat, lo, hi, hiRaw) = wilson(x)
      val (gn, gx, gRate, gLo, gHi, gPass) = got(label)
      assert(gn == n.toLong && gx == x, label)
      assert(gRate == round6(phat), label)
      assert(gLo == round6(lo) && gHi == round6(hi), label)
      assert(gPass == (hiRaw <= 0.15), label)
      // The interval must cover the TRUE full-table rate (the estimate's
      // whole point): planted rates are 1/7, 1/5, 1/3.
      val truth = (1L to 400L).count(_ % mod == 0) / 400.0
      assert(gLo <= truth && truth <= gHi,
        s"$label: [$gLo, $gHi] misses true rate $truth")
    }
  }

  test("triage: sample bounds decide the clear checks, straddlers get exact rates") {
    // budget 0.15 over planted rates ~0/1, 1/7, 1/5, 1/3 on a ~50-row
    // 2/16 sample: "always" is known-green, matches_tag (1/3) known-red,
    // complete_opt / range_v straddle and pay the exact pass.
    val s4 = CheckSuite(suite.checks :+ Satisfies("always", "v > -1e9", 1.0))
    val got = s4.triage(fixture, "id", Seq("0", "1"), maxViolRate = 0.15)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size == 4)

    // Recompute the decision in plain Scala from the same Wilson bounds.
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char = {
      val h = md.digest(s.getBytes("UTF-8"))
      "0123456789abcdef".charAt((h(0) >> 4) & 0xf)
    }
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sampled = (1L to 400L).filter(id => "01".contains(hex1(id.toString)))
    val n = sampled.size.toDouble
    for ((label, viol) <- Seq[(String, Long => Boolean)](
        ("complete_opt", _ % 7 == 0), ("range_v", _ % 5 == 0),
        ("matches_tag", _ % 3 == 0), ("always", _ => false))) {
      val x = sampled.count(viol).toDouble
      val phat = x / n
      val denom = 1.0 + 3.8416 / n
      val center = (phat + 3.8416 / (2.0 * n)) / denom
      val half = 1.96 * math.sqrt(phat * (1.0 - phat) / n +
        3.8416 / (4.0 * n * n)) / denom
      val (lo, hi) = (round6(math.max(0.0, center - half)),
        round6(math.min(1.0, center + half)))
      val (gm, gRate, gPass) = got(label)
      if (hi <= 0.15) {
        assert(gm == "sample" && gPass, label)
        assert(gRate == round6(phat), label)
      } else if (lo > 0.15) {
        assert(gm == "sample" && !gPass, label)
        assert(gRate == round6(phat), label)
      } else {
        val exact = (1L to 400L).count(viol) / 400.0
        assert(gm == "exact", label)
        assert(gRate == round6(exact), label)
        assert(gPass == (exact <= 0.15), label)
      }
    }
    // the planted design exercises all three branches for real
    assert(got("always")._1 == "sample" && got("always")._3)
    assert(got("matches_tag")._1 == "sample" && !got("matches_tag")._3)
    assert(got.values.count(_._1 == "exact") >= 1, "no straddler paid the exact pass")
  }

  test("triage: when nothing straddles, the table is never rescanned") {
    // budget 0.9 clears every check from the sample; the result plan's
    // only leaf is the local relation of collected decisions — no
    // second scan of the input exists anywhere in the query.
    val got = suite.triage(fixture, "id", Seq("0", "1"), maxViolRate = 0.9)
    val leaves = got.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"expected only LocalRelation leaves, got:\n${got.queryExecution.optimizedPlan}")
    val rows = got.collect()
    assert(rows.length == 3 && rows.forall(r =>
      r.getString(1) == "sample" && r.getBoolean(3)))
  }

  test("a wider sample tightens the interval") {
    val narrow = suite.estimate(fixture, "id", Seq("0"), 0.15).collect()
      .map(r => r.getString(0) -> (r.getDouble(5) - r.getDouble(4))).toMap
    val wide = suite.estimate(fixture, "id", Seq("0", "1", "2", "3", "4",
      "5", "6", "7"), 0.15).collect()
      .map(r => r.getString(0) -> (r.getDouble(5) - r.getDouble(4))).toMap
    narrow.keys.foreach { k =>
      assert(wide(k) < narrow(k), s"$k: widening the sample must shrink the CI")
    }
  }
}
