package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import java.sql.Timestamp

/** The bucketed interval join must equal a plain-Scala nested-loop range
  * join EXACTLY (pair set, overlap amounts, relation labels, exactly-once
  * emission across bucket boundaries) and its plan must contain no
  * cartesian product or broadcast nested loop. */
class IntervalJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  // event rows engineered so intervals straddle bucket borders:
  // duration rule (60 + id % 600) s, bucket width 1024 s. `base` is
  // bucket-aligned (1699999744 = 1024 * 1660156), so borders sit at
  // base + 1024k seconds exactly.
  private def mkEvents = {
    import spark.implicits._
    val base = 1699999744L // epoch seconds, multiple of 1024
    Seq(
      // user 1: a(id 598, dur 658 s) [0, 658] contains b(id 1, dur 61)
      // [100, 161]; a(id 2, dur 62) [1000, 1062] and b(id 3, dur 63)
      // [1020, 1083] overlap ACROSS the border at 1024 — the pair
      // shares two buckets
      (598L, base + 0L, 1L), (1L, base + 100L, 1L),
      (2L, base + 1000L, 1L), (3L, base + 1020L, 1L),
      // user 2: disjoint a/b — no pairs
      (4L, base + 0L, 2L), (5L, base + 5000L, 2L),
      // user 3: identical starts with b longer (b_contains_a tie on
      // from), plus a(id 8, dur 68) [3000, 3068] MET exactly by
      // b(id 9) at 3068 (half-open: NOT an overlap)
      (6L, base + 2000L, 3L), (7L, base + 2000L, 3L),
      (8L, base + 3000L, 3L), (9L, base + 3068L, 3L)
    ).map { case (id, ts, u) =>
      (id, new Timestamp(ts * 1000L), u, "e", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def durUs(id: Long): Long = (60L + id % 600L) * 1000000L

  test("bucketed join equals plain-Scala nested-loop range join") {
    import spark.implicits._
    val events = mkEvents
    val got = IntervalJoin.overlapJoin(events)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq

    // plain-Scala ground truth
    val rows = events.select("event_id", "ts", "user_id")
      .as[(Long, Timestamp, Long)].collect()
    def iv(id: Long, ts: Timestamp) = {
      val f = ts.getTime * 1000L; (f, f + durUs(id))
    }
    val a = rows.filter(_._1 % 2 == 0)
    val b = rows.filter(_._1 % 2 == 1)
    val want = (for {
      (ai, ats, au) <- a; (bi, bts, bu) <- b if au == bu
      (af, at) = iv(ai, ats); (bf, bt) = iv(bi, bts)
      if af < bt && bf < at
    } yield {
      val ov = math.min(at, bt) - math.max(af, bf)
      val rel =
        if (af <= bf && bt <= at) "a_contains_b"
        else if (bf <= af && at <= bt) "b_contains_a"
        else "overlaps"
      (au, ai, bi, af, at, bf, bt, ov, rel)
    }).sortBy(t => (t._1, t._2, t._3)).toSeq

    assert(want.nonEmpty && want.exists(_._9 == "overlaps") &&
      want.exists(_._9 == "a_contains_b"),
      "fixture must exercise overlap AND containment")
    assert(got == want, s"bucketed join diverged:\n$got\n$want")
    // user 2 contributes nothing; the end==start pair is excluded
    assert(!got.exists(_._1 == 2L))
    assert(!got.exists(p => p._2 == 8L && p._3 == 9L),
      "half-open: meets (end == start) is not an overlap")
  }

  test("cross-bucket pair is emitted exactly once") {
    import spark.implicits._
    // interval pair overlapping across the bucket border shares 2
    // buckets — emit-at-later-start must yield ONE row
    val got = IntervalJoin.overlapJoin(mkEvents)
      .filter("a_id = 2 AND b_id = 3").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("rel") == "overlaps")
  }

  test("plan is an equi-join: no cartesian, no broadcast NLJ") {
    val plan = IntervalJoin.overlapJoin(mkEvents)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }
}
