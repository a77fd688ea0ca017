package graft.validation

import graft.images.ImageGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-rule engine surfaced through the driver contract: each query runs
  * (or reuses) the full constraint suite over the synthesized image+caption
  * table scaled to the requested sf tier. No oracleSql — correctness is
  * ScalaTest-verified against plain-Scala recomputation (ImageSuiteSpec);
  * the driver records rows-only checks here.
  */
object ImageSuiteQueries {

  /** sf tier → row count (sf0.001→5k, sf0.01→50k, sf0.1→500k). */
  def rowsFor(sfDir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max(2000L, math.min(500000L, (sf * 5000000).toLong))
  }

  // One suite execution per (session, dataset dir): cached DataFrames are
  // bound to the session that built them, so a stop/recreate-session
  // pattern (the Bench flow) must not resurrect frames from a dead session.
  private val cache = scala.collection.mutable.Map[(SparkSession, String), (DataFrame, DataFrame, DataFrame)]()

  def suite(s: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) =
    cache.synchronized {
      cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      cache.getOrElseUpdate((s, sfDir), {
        val dir = ImageGen.ensure(s, rowsFor(sfDir))
        val (v, viol, m) = ImageSuite.run(s, dir, "verify")
        (v.cache(), viol.cache(), m.cache())
      })
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full verdict table: one row per (partition, check), always emitted.
    "qi_verdicts" -> ((s, dir) => {
      val (v, _, _) = suite(s, dir)
      v.orderBy("part", "check")
    }),
    // Typed violation rows (issues[] twin).
    "qi_violations" -> ((s, dir) => {
      val (_, viol, _) = suite(s, dir)
      viol.orderBy("part", "check", "image_id")
    }),
    // V8: per-partition overall score composed from the graded sub-scores
    // (ValidationResult.overall_score twin, validation_agent.py:422-424).
    "qi_overall_scores" -> ((s, dir) => {
      val (v, _, _) = suite(s, dir)
      Scoring.overallScores(v).orderBy("part")
    }),
    // Per-partition metric rows (PerformanceTimer twin).
    "qi_metrics" -> ((s, dir) => {
      val (_, _, m) = suite(s, dir)
      m.orderBy("part", "metric")
    }),
    // Column-stats family incl. the sketch aggregates that have no DuckDB
    // twin (approx_count_distinct HLL++, percentile_approx GK).
    "qi_colstats_sketch" -> ((s, dir) => {
      val d = ImageGen.ensure(s, rowsFor(dir))
      ImageGen.images(s, d).groupBy("part").agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("image_id")).as("ndv_approx"),
        percentile_approx(col("w"), lit(0.5), lit(1000)).as("median_w"),
        min("w").as("min_w"), max("w").as("max_w"),
        avg(when(col("caption").isNull, 1.0).otherwise(0.0)).as("caption_null_rate"))
        .orderBy("part")
    }),
    // Multimodal binary pipeline surfaced to the driver: batched feature
    // extraction over the synthetic media table (images real, audio/video
    // deterministic stubs) — per-kind feature roll-up.
    "qi_media_features" -> ((s, dir) => {
      val media = graft.multimodal.BinaryPipeline.synthMedia(s, 3000)
      val feats = graft.multimodal.BinaryPipeline.extractFeatures(media)
      feats.toDF().groupBy("kind", "sniffed").agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("bytes_total"),
        sum("n_frames").as("frames_total"),
        countDistinct("phash").as("ndv_phash"))
        .orderBy("kind", "sniffed")
    }),
    // Drift snapshot + check against a persisted clean baseline — the
    // baseline-snapshot-table path (vs the default global baseline).
    "qi_drift_vs_baseline" -> ((s, dir) => {
      val d = ImageGen.ensure(s, rowsFor(dir))
      val images = ImageGen.images(s, d).select("image_id", "part", "w", "h", "caption")
      val clean = images.filter(!col("part").isin(ImageGen.DriftedParts.map("p" + _): _*))
      val base = s"$d/baseline"
      if (!new java.io.File(s"$base/histogram").exists())
        Drift.snapshot(s, clean, base)
      val (verd, _) = Drift.check(images, "baseline", Some(base))
      verd.orderBy("part", "check")
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}
