package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mahalanobis outlier gate vs a plain-Scala recomputation on a
  * constructed bivariate cloud with planted joint-structure outliers:
  * points unremarkable per-column but off the correlation axis MUST be
  * flagged; on-axis points at the same per-column magnitudes MUST NOT. */
class MahalanobisSpec extends SparkTestBase {

  import spark.implicits._

  // tight correlated cloud y ≈ 2x (x in 10..59), plus two planted rows:
  // an OFF-AXIS point (30, 20) — x and y both inside the marginal ranges —
  // and an ON-AXIS far point (59, 118) that univariate gates would rank
  // higher but joint structure forgives
  private lazy val rows: Seq[(Long, Double, Double)] = {
    val cloud = (0 until 200).map { i =>
      val x = 10.0 + (i % 50)
      val y = 2.0 * x + ((i * 7) % 11 - 5) * 0.3
      (i.toLong, x, y)
    }
    cloud :+ (900L, 30.0, 20.0) :+ (901L, 59.0, 118.3)
  }

  private lazy val df =
    rows.toDF("id", "x", "y")

  test("flags the off-axis point, not the on-axis extreme") {
    val out = StatChecks.mahalanobisOutliers(df, "x", "y", Seq("id"))
      .collect()
    val ids = out.map(_.getAs[Long]("id")).toSet
    assert(ids.contains(900L), s"off-axis planted point missed: $ids")
    assert(!ids.contains(901L), s"on-axis point wrongly flagged: $ids")
  }

  test("d2 matches a plain-Scala recomputation") {
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val syy = rows.map(r => r._3 * r._3).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val vxx = (n * sxx - sx * sx) / (n * n)
    val vyy = (n * syy - sy * sy) / (n * n)
    val vxy = (n * sxy - sx * sy) / (n * n)
    val det = vxx * vyy - vxy * vxy
    def d2(x: Double, y: Double): Double = {
      val dx = x - sx / n; val dy = y - sy / n
      (dx * dx * vyy - 2 * dx * dy * vxy + dy * dy * vxx) / det
    }
    val expected = rows.filter(r => d2(r._2, r._3) > StatChecks.MahalanobisChi2Df2P999)
      .map(r => r._1 -> BigDecimal(d2(r._2, r._3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = StatChecks.mahalanobisOutliers(df, "x", "y", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("d2")).toMap
    assert(got.keySet == expected.keySet, s"got=$got expected=$expected")
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-5, s"id $k: $v vs ${expected(k)}")
    }
  }

  test("collinear columns yield zero rows, never a division blowup") {
    val lin = (0 until 100).map(i => (i.toLong, i.toDouble, 3.0 * i))
      .toDF("id", "x", "y")
    assert(StatChecks.mahalanobisOutliers(lin, "x", "y", Seq("id")).count() == 0)
  }
}
