package graft.validation

import graft.SparkTestBase
import graft.images.ImageGen

/** The distributed drift-finalize guard: above DriverFinalizeMaxPartials
  * the chi²/KS math runs in executors from a broadcast baseline instead of
  * collecting every partial to the driver. Both paths share finalizeOne,
  * and this spec proves end-to-end that they emit identical verdicts and
  * violations (driverFinalizeMax = 0 forces the distributed branch).
  */
class DriftDistributedSpec extends SparkTestBase {

  lazy val light: org.apache.spark.sql.DataFrame = {
    val d = ImageGen.ensure(spark, 2000L, "target/test-images")
    ImageGen.images(spark, d).select("image_id", "part", "w", "h", "caption")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Boolean, Double, Double, Long, Long)] =
    df.collect().map(r => (r.getAs[String]("part"), r.getAs[String]("check"),
      r.getAs[Boolean]("pass"), r.getAs[Double]("metric"),
      r.getAs[Double]("threshold"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("n_violations"))).toSet

  test("driver-side and distributed finalize produce identical drift verdicts") {
    // With a DERIVED global baseline the t-digest reduce order differs
    // between the two paths, so the KS statistic agrees only to sketch
    // tolerance (chi² is an integer histogram — exact). With a persisted
    // baseline (the pattern a 10^6-partition table uses anyway, next test)
    // both statistics are bit-identical.
    val (vDriver, _) = Drift.check(light, "t")
    val (vDist, _) = Drift.check(light, "t", None, driverFinalizeMax = 0)
    def keyed(s: Set[(String, String, Boolean, Double, Double, Long, Long)]) =
      s.map(t => (t._1, t._2) -> t).toMap
    val a = keyed(rows(vDriver)); val b = keyed(rows(vDist))
    assert(a.keySet == b.keySet && a.nonEmpty)
    for ((k, x) <- a) {
      val y = b(k)
      assert((x._3, x._5, x._6, x._7) == (y._3, y._5, y._6, y._7), s"$k: $x vs $y")
      if (k._2.startsWith("drift_chi2")) assert(x._4 == y._4, s"$k chi2 differs")
      else assert(math.abs(x._4 - y._4) < 0.02, s"$k ks beyond sketch tolerance")
    }
  }

  test("distributed finalize against a persisted baseline snapshot matches too") {
    val base = "target/drift-dist-baseline"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    Drift.snapshot(spark, light, base)
    val (vDriver, _) = Drift.check(light, "t", Some(base))
    val (vDist, _) = Drift.check(light, "t", Some(base), driverFinalizeMax = 0)
    assert(rows(vDriver) == rows(vDist))
  }
}
