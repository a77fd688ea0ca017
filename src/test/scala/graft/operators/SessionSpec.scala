package graft.operators

import graft.{SessionQueries, SparkTestBase, Tables}

/** Independent plain-Scala recomputation of the sessionization family,
  * plus the cross-rung proof that Spark's native session_window grouping
  * yields EXACTLY the sessions the relational lag-based definition does.
  */
class SessionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private case class Ev(id: Long, user: Long, tsUs: Long, typ: String)

  private lazy val evs: Seq[Ev] =
    Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts", "event_type")
      .collect()
      .map { r =>
        val i = r.getAs[java.time.LocalDateTime]("ts")
          .toInstant(java.time.ZoneOffset.UTC)
        Ev(r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getAs[String]("event_type"))
      }
      .toSeq

  private val gapUs = SessionQueries.SessionGapSec * 1000000L

  /** Plain-Scala session assignment: running split on gap ≥ threshold. */
  private def expectAssign: Map[Long, Long] =
    evs.groupBy(_.user).values.flatMap { us =>
      val sorted = us.sortBy(e => (e.tsUs, e.id))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e.tsUs - prev >= gapUs) seq += 1
        prev = e.tsUs
        e.id -> seq
      }
    }.toMap

  test("q_sess_assign matches the plain-Scala gap splitter") {
    val got = SessionQueries.queries("q_sess_assign")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("sess_seq"))
      .toMap
    assert(got == expectAssign)
  }

  test("native session_window sessions are exactly the lag-based sessions") {
    // compare on (user, start_us, n_events) — a bijection iff the two
    // definitions cut sessions at identical boundaries
    val want = evs.map(e => (e.user, expectAssign(e.id)))
      .groupBy(identity).view
      .map { case ((u, seq), g) =>
        val times = evs.filter(e => e.user == u && expectAssign(e.id) == seq).map(_.tsUs)
        (u, times.min, g.size.toLong)
      }.toSet
    val got = SessionQueries.queries("q_sess_stats")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("n_events")))
      .toSet
    assert(got == want)
  }

  test("gap invariants: intra-session gaps < threshold, inter-session gaps >= it") {
    val assign = expectAssign
    evs.groupBy(_.user).values.foreach { us =>
      val sorted = us.sortBy(e => (e.tsUs, e.id))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          if (assign(a.id) == assign(b.id))
            assert(b.tsUs - a.tsUs < gapUs)
          else assert(b.tsUs - a.tsUs >= gapUs)
        case _ =>
      }
    }
  }

  test("q_sess_funnel stages are monotone and match recomputation") {
    val assign = expectAssign
    val perSess = evs.groupBy(e => (e.user, assign(e.id))).values.toSeq
    def first(g: Seq[Ev], t: String): Option[Long] =
      g.filter(_.typ == t).map(_.tsUs).minOption
    val nView = perSess.count(g => first(g, "view").isDefined).toLong
    val nVC = perSess.count(g => (first(g, "view"), first(g, "click")) match {
      case (Some(v), Some(c)) => v < c
      case _ => false
    }).toLong
    val nFull = perSess.count(g =>
      (first(g, "view"), first(g, "click"), first(g, "purchase")) match {
        case (Some(v), Some(c), Some(p)) => v < c && c < p
        case _ => false
      }).toLong
    val r = SessionQueries.queries("q_sess_funnel")(spark, dir).collect().head
    assert(r.getAs[Long]("n_sessions") == perSess.size.toLong)
    assert(r.getAs[Long]("n_view") == nView)
    assert(r.getAs[Long]("n_view_click") == nVC)
    assert(r.getAs[Long]("n_full_funnel") == nFull)
    assert(nView >= nVC && nVC >= nFull)
  }
}
