package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Segmented drift must FLAG a planted drifted segment, stay quiet on
  * conforming ones, and match a plain-Scala chi² recomputation. */
class SegmentedDriftSpec extends SparkTestBase {

  test("planted drifted segment flags; conforming segments do not") {
    import spark.implicits._
    // three conforming segments draw the same deterministic ramp over
    // buckets 0..9; the planted one concentrates all mass in bucket 42
    // the planted segment stays SMALL (0.5% of the corpus) so it cannot
    // contaminate the corpus baseline the conforming segments are judged
    // against — the realistic shape of one bad partition in a big table
    val conforming = for {
      seg <- Seq("a", "b", "c"); i <- 0 until 2000
    } yield (seg, (i % 10) * 5.0 + (i % 5)) // buckets 0..9 at width 5
    val planted = (0 until 30).map(i => ("bad", 210.0 + (i % 3)))
    val df = (conforming ++ planted).toDF("seg", "v")

    val got = Drift.segmentedChiSq(df, "seg", "v",
        bucketWidth = 5.0, threshold = 2.0)
      .collect()
      .map(r => r.getAs[String]("segment") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Double]("chi2"),
          r.getAs[Boolean]("drifted")))
      .toMap

    assert(got("bad")._3, s"planted segment must flag: ${got("bad")}")
    Seq("a", "b", "c").foreach(s =>
      assert(!got(s)._3, s"conforming segment $s flagged: ${got(s)}"))

    // plain-Scala recomputation of every cell
    val all = conforming ++ planted
    val bucketOf = (v: Double) => math.floor(v / 5.0).toLong
    val corpus = all.groupBy(t => bucketOf(t._2)).view.mapValues(_.size.toLong).toMap
    val corpusTot = all.size.toDouble
    all.groupBy(_._1).foreach { case (seg, rows) =>
      val obs = rows.groupBy(t => bucketOf(t._2)).view.mapValues(_.size.toLong).toMap
      val segTot = rows.size.toDouble
      val chi2 = corpus.map { case (b, cCnt) =>
        val e = segTot * cCnt.toDouble / corpusTot
        val o = obs.getOrElse(b, 0L).toDouble
        (o - e) * (o - e) / e
      }.sum
      val want = BigDecimal(chi2).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(got(seg)._1 == corpus.size.toLong)
      assert(math.abs(got(seg)._2 - want) < 1e-6,
        s"$seg chi2 ${got(seg)._2} vs $want")
    }
  }
}
