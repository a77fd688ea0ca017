package graft.validation

import graft.SparkTestBase
import graft.images.{ImageCodec, ImageGen, Phash}
import org.apache.spark.sql.functions._

/** Graded scoring (V1) + overall composition (V8) against an independent
  * plain-Scala recomputation over the same deterministic rows.
  */
class ScoringSpec extends SparkTestBase {

  val N = 2000L
  lazy val dataDir: String = ImageGen.ensure(spark, N, "target/test-images")
  lazy val np: Int = ImageGen.nParts(N)
  lazy val rows: Seq[ImageGen.GenRow] = (0L until N).map(ImageGen.genRow(_, np))

  def psnrLadder(p: Double): Double =
    if (p >= 45.0) 1.0 else if (p >= 40.0) 0.8 else if (p >= 30.0) 0.6 else 0.2
  def hamLadder(h: Int): Double =
    if (h == 0) 1.0 else if (h <= 4) 0.8 else if (h <= 10) 0.6 else 0.2
  def rateLadder(r: Double): Double =
    if (r == 0.0) 1.0 else if (r <= 0.01) 0.8 else if (r <= 0.05) 0.6 else 0.2

  lazy val verdictRows: Seq[(String, String, Boolean, Double, Double)] = {
    val (verdicts, _, _) = ImageSuite.run(spark, dataDir, "score-test")
    verdicts.select("part", "check", "pass", "metric", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4))).toSeq
  }

  test("psnr_quality metric equals the plain-Scala mean of the per-row ladder") {
    // independent recomputation: decode every row, ladder its PSNR, average
    val expected = rows.groupBy(_.part).flatMap { case (part, rs) =>
      val scores = rs.flatMap { r =>
        val dec = if (r.bytes != null && r.bytes.nonEmpty) ImageCodec.decode(r.bytes) else None
        dec.map { case (px, dw, dh) =>
          val truth = ImageGen.truthPixels(r.image_id.stripPrefix("img-").toLong, dw, dh)
          psnrLadder(ImageCodec.psnr(px, truth).get)
        }
      }
      if (scores.nonEmpty) Some(part -> scores.sum / scores.size) else Some(part -> 0.5)
    }
    val got = verdictRows.filter(_._2 == "psnr_quality").map(v => v._1 -> v._4).toMap
    assert(got.keySet == expected.keySet)
    for ((p, e) <- expected)
      assert(math.abs(got(p) - e) < 1e-9, s"psnr_quality $p: got ${got(p)}, expected $e")
  }

  test("phash_quality metric equals the plain-Scala mean of the hamming ladder") {
    val expected = rows.groupBy(_.part).map { case (part, rs) =>
      val scores = rs.flatMap { r =>
        val dec = if (r.bytes != null && r.bytes.nonEmpty) ImageCodec.decode(r.bytes) else None
        dec.map { case (px, dw, dh) =>
          hamLadder(Phash.hamming(Phash.phash64(px, dw, dh), r.phash)) }
      }
      if (scores.nonEmpty) part -> scores.sum / scores.size else part -> 0.5
    }
    val got = verdictRows.filter(_._2 == "phash_quality").map(v => v._1 -> v._4).toMap
    for ((p, e) <- expected)
      assert(math.abs(got(p) - e) < 1e-9, s"phash_quality $p: got ${got(p)}, expected $e")
  }

  test("every verdict carries a score and rate checks follow the ladder") {
    assert(verdictRows.nonEmpty)
    verdictRows.foreach { case (part, check, _, metric, score) =>
      assert(score >= 0.2 && score <= 1.0, s"$part|$check score=$score")
      if (!check.startsWith("drift_") && !check.endsWith("_quality"))
        assert(score == rateLadder(metric), s"$part|$check metric=$metric score=$score")
    }
  }

  test("overall_score is the mean of the partition's sub-scores (V8)") {
    val (verdicts, _, _) = ImageSuite.run(spark, dataDir, "score-test")
    val overall = Scoring.overallScores(verdicts)
      .select("part", "overall_score", "n_checks").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val byPart = verdictRows.groupBy(_._1)
    assert(overall.nonEmpty)
    overall.foreach { case (part, got, nChecks) =>
      val scores = byPart(part).map(_._5)
      assert(nChecks == scores.size)
      assert(math.abs(got - scores.sum / scores.size) < 1e-9,
        s"overall $part: got $got expected ${scores.sum / scores.size}")
    }
  }

  test("clean partitions outscore heavily-defective ones") {
    val (verdicts, _, _) = ImageSuite.run(spark, dataDir, "score-test")
    val overall = Scoring.overallScores(verdicts)
      .select("part", "overall_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // defect density differs by partition construction; the composed score
    // must separate the best from the worst partition
    assert(overall.values.max > overall.values.min,
      s"scores do not discriminate: $overall")
  }
}
