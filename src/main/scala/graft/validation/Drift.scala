package graft.validation

import graft.sketch.TDigest
import org.apache.spark.sql.{DataFrame, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distribution-drift checks (V10): per-partition w/h distributions vs a
  * baseline snapshot — chi-square over bucketed counts (exchange-friendly:
  * one groupBy) and KS over mergeable t-digest quantile sketches (driver
  * computes the statistic from two small digests, SURVEY.md §2.10).
  *
  * Reference analogue: records validated against study peers + hardcoded
  * priors (/root/reference/src/crawl_first/validation_agent.py:85-109,
  * 258-305); here the "peers" are the other partitions (global baseline)
  * or a persisted snapshot table.
  */
object Drift {

  val BucketWidth = 8.0

  /** Mergeable t-digest aggregator over a double column. */
  class TDigestAgg(compression: Double = 100.0)
      extends Aggregator[Double, TDigest, Array[Byte]] {
    def zero: TDigest = new TDigest(compression)
    def reduce(b: TDigest, a: Double): TDigest = { b.add(a); b }
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(r: TDigest): Array[Byte] = r.toBytes
    def bufferEncoder = Encoders.kryo[TDigest]
    def outputEncoder = Encoders.BINARY
  }

  /** Long-form (part, colname, value) for the drift columns w, h. */
  private def melted(images: DataFrame): DataFrame =
    images.select(col("part"),
        explode(array(
          struct(lit("w").as("colname"), col("w").cast("double").as("value")),
          struct(lit("h").as("colname"), col("h").cast("double").as("value")))).as("e"))
      .select(col("part"), col("e.colname").as("colname"), col("e.value").as("value"))

  /** Bucketed histogram per (part, colname, bucket). */
  def histogram(images: DataFrame): DataFrame =
    melted(images)
      .groupBy(col("part"), col("colname"),
        floor(col("value") / BucketWidth).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Baseline snapshot: global histogram + per-column global t-digest. */
  def snapshot(spark: SparkSession, images: DataFrame, dir: String): Unit = {
    histogram(images).groupBy("colname", "bucket").agg(sum("cnt").as("cnt"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/histogram")
    digests(images, byPart = false)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/digests")
  }

  def readBaseline(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/histogram")

  /** Per-(part?, colname) t-digest sketches. */
  def digests(images: DataFrame, byPart: Boolean): DataFrame = {
    val td = udaf(new TDigestAgg())
    val m = melted(images)
    if (byPart) m.groupBy("part", "colname").agg(td(col("value")).as("sketch"))
    else m.groupBy("colname").agg(td(col("value")).as("sketch"))
  }

  /** Drift verdicts per partition: chi-square (bucketed counts vs baseline
    * proportions) + KS (t-digest CDFs, computed on the driver from the
    * small per-part sketches). With `baselineDir`, both the histogram and
    * the reference digests come from the persisted snapshot; otherwise the
    * current global distribution is the baseline. Returns
    * (verdicts, violations).
    */
  def check(images: DataFrame, runId: String,
            baselineDir: Option[String] = None): (DataFrame, DataFrame) = {
    val spark = images.sparkSession
    import spark.implicits._

    val hist = histogram(images).cache()
    val global = baselineDir.map(d => readBaseline(spark, d))
      .getOrElse(hist.groupBy("colname", "bucket").agg(sum("cnt").as("cnt")))
      .select(col("colname"), col("bucket"), col("cnt").as("g_cnt"))
    val gTot = global.groupBy("colname").agg(sum("g_cnt").as("g_tot"))
    val pTot = hist.groupBy("part", "colname").agg(sum("cnt").as("p_tot"))

    // chi-square: expected = p_tot * g_cnt/g_tot per bucket
    val chi2 = hist.join(global, Seq("colname", "bucket"), "right")
      .join(broadcast(gTot), Seq("colname"))
      .join(pTot, Seq("part", "colname"))
      .na.fill(0L, Seq("cnt"))
      .withColumn("e", col("p_tot").cast("double") * col("g_cnt").cast("double") / col("g_tot").cast("double"))
      .filter(col("e") > 0)
      .withColumn("term",
        (col("cnt").cast("double") - col("e")) * (col("cnt").cast("double") - col("e")) / col("e"))
      .groupBy("part", "colname")
      .agg(sum("term").as("chi2"), sum("cnt").as("n_rows"))

    // KS from mergeable t-digests: per-part sketch vs global sketch.
    // The global digest is the MERGE of the per-part digests (driver-side,
    // sketches are tiny) — one pass over the data, not two; exactly the
    // property that lets sketches accumulate across resumed runs.
    // Partial sketches built in plain Scala per input partition (no per-row
    // aggregator-buffer serialization), merged on the driver: one narrow
    // pass, ~(#splits × #parts × 2) tiny sketch rows collected. The udaf
    // path ([[digests]]) remains for snapshot persistence.
    val partial = images.select(col("part"), col("w").cast("double"), col("h").cast("double"))
      .as[(String, Double, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map[(String, String), TDigest]()
        it.foreach { case (p, w, h) =>
          m.getOrElseUpdate((p, "w"), new TDigest(100)).add(w)
          m.getOrElseUpdate((p, "h"), new TDigest(100)).add(h)
        }
        m.iterator.map { case ((p, c), td) => (p, c, td.toBytes) }
      }.collect()
    val merged: Map[(String, String), TDigest] = partial
      .groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> xs.map(x => TDigest.fromBytes(x._3)).reduce(_ merge _) }
    val globalDig: Map[String, TDigest] = baselineDir.map { d =>
      spark.read.parquet(s"$d/digests").as[(String, Array[Byte])].collect()
        .map { case (c, b) => c -> TDigest.fromBytes(b) }.toMap
    }.getOrElse {
      merged.groupBy(_._1._2).map { case (c, xs) =>
        c -> xs.values.map(td => TDigest.fromBytes(td.toBytes)).reduce(_ merge _)
      }
    }
    val ksRows = merged.toSeq.map { case ((part, colname), td) =>
      (part, colname, TDigest.ks(td, globalDig(colname)))
    }
    val ksDf = spark.createDataFrame(ksRows).toDF("part", "colname", "ks")

    val joined = chi2.join(ksDf, Seq("part", "colname"))
    val verdicts = joined.flatMap { row =>
      val part = row.getAs[String]("part")
      val colname = row.getAs[String]("colname")
      val nRows = row.getAs[Long]("n_rows")
      val c2 = row.getAs[Double]("chi2")
      val ks = row.getAs[Double]("ks")
      Seq(
        Verdict(part, s"drift_chi2_$colname", c2 <= ImageSuite.DriftChi2Max,
          c2, ImageSuite.DriftChi2Max, nRows,
          if (c2 <= ImageSuite.DriftChi2Max) 0L else 1L, runId),
        Verdict(part, s"drift_ks_$colname", ks <= ImageSuite.DriftKsMax,
          ks, ImageSuite.DriftKsMax, nRows,
          if (ks <= ImageSuite.DriftKsMax) 0L else 1L, runId))
    }.toDF()

    val violations = verdicts.filter(!col("pass"))
      .select(col("part"), lit("-").as("image_id"), col("check"),
        concat(lit("stat="), round(col("metric"), 4)).as("observed"),
        concat(lit("<= "), col("threshold")).as("expected"))
    (verdicts, violations)
  }
}
