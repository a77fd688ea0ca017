package graft.validation

import graft.SparkTestBase
import graft.images.ImageGen
import org.apache.spark.sql.functions._

/** The relational drift-vs-baseline legs against the sketch path and the
  * planted ground truth: baselineChiSq must equal finalizeOne's chi²
  * bit-for-bit (both are pure integer-histogram math; only round-6
  * presentation differs), and both relational legs must flag EXACTLY the
  * generator's planted drifted partitions — a detector that never fires
  * is worse than none (the first PSI variant renormalized over common
  * support and was blind to the planted two-bucket support shift).
  */
class DriftBaselineSpec extends SparkTestBase {

  private val tier = "/x/sf0.0005" // 2500 rows

  private lazy val (images, base) = {
    val d = ImageGen.ensure(spark, ImageSuiteQueries.rowsFor(tier))
    val b = ImageSuiteQueries.ensureBaseline(spark, tier)
    (ImageGen.images(spark, d).select("image_id", "part", "w", "h", "caption"), b)
  }

  private lazy val driftedParts = ImageGen.DriftedParts.map("p" + _).toSet

  test("baselineChiSq == sketch-path chi2 (finalizeOne) per (part, colname)") {
    val rel = Drift.baselineChiSq(images.select("part", "w", "h"),
        Drift.readBaseline(spark, base))
      .collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("colname")) ->
        r.getAs[Double]("chi2")).toMap
    val (verd, _) = Drift.check(images, "spec", Some(base))
    val sketch = verd.filter(col("check").startsWith("drift_chi2_"))
      .collect()
      .map(r => (r.getAs[String]("part"),
        r.getAs[String]("check").stripPrefix("drift_chi2_")) ->
        r.getAs[Double]("metric")).toMap
    assert(rel.keySet == sketch.keySet)
    rel.foreach { case (k, v) =>
      assert(math.abs(v - sketch(k)) < 1e-6, s"$k: rel=$v sketch=${sketch(k)}")
    }
  }

  test("chi2 leg flags exactly the planted drifted partitions") {
    val rel = Drift.baselineChiSq(images.select("part", "w", "h"),
      Drift.readBaseline(spark, base)).collect()
    assert(rel.nonEmpty)
    rel.foreach { r =>
      val part = r.getAs[String]("part")
      assert(r.getAs[Boolean]("drifted") == driftedParts(part),
        s"chi2 $part/${r.getAs[String]("colname")}: " +
          s"chi2=${r.getAs[Double]("chi2")} drifted=${r.getAs[Boolean]("drifted")}")
    }
  }

  test("EMD leg flags exactly the planted drifted partitions, at ~2 bucket widths") {
    val emd = Drift.baselineEmd(images.select("part", "w", "h"),
      Drift.readBaseline(spark, base)).collect()
    assert(emd.nonEmpty)
    emd.foreach { r =>
      val part = r.getAs[String]("part")
      val v = r.getAs[Double]("emd")
      assert(r.getAs[Boolean]("drifted") == driftedParts(part),
        s"emd $part/${r.getAs[String]("colname")}: emd=$v")
      // the planted shift is exactly +2 bucket widths, and EMD — unlike
      // chi²/PSI — reads the DISTANCE moved: drifted ≈ 2, clean ≈ noise
      if (driftedParts(part)) assert(v > 1.5 && v < 2.5, s"$part: $v")
      else assert(v < 0.2, s"$part: $v")
    }
  }

  test("JSD leg flags exactly the planted drifted partitions, bounded by ln 2") {
    val jsd = Drift.baselineJsd(images.select("part", "w", "h"),
      Drift.readBaseline(spark, base)).collect()
    assert(jsd.nonEmpty)
    jsd.foreach { r =>
      val part = r.getAs[String]("part")
      val v = r.getAs[Double]("jsd")
      assert(v >= 0.0 && v <= math.log(2.0) + 1e-9, s"$part: jsd=$v out of [0, ln 2]")
      assert(r.getAs[Boolean]("drifted") == driftedParts(part),
        s"jsd $part/${r.getAs[String]("colname")}: jsd=$v")
      // a full support shift drives JSD toward its ln 2 ceiling; clean
      // partitions sit at smoothing noise
      if (driftedParts(part)) assert(v > 0.3, s"$part: $v")
      else assert(v < 0.05, s"$part: $v")
    }
  }

  test("PSI leg flags exactly the planted drifted partitions (support shift)") {
    val psi = Drift.baselinePsi(images.select("part", "w", "h"),
      Drift.readBaseline(spark, base)).collect()
    assert(psi.nonEmpty)
    psi.foreach { r =>
      val part = r.getAs[String]("part")
      assert(r.getAs[Boolean]("drifted") == driftedParts(part),
        s"psi $part/${r.getAs[String]("colname")}: " +
          s"psi=${r.getAs[Double]("psi")} drifted=${r.getAs[Boolean]("drifted")}")
    }
  }
}
