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

  /** Per-input-split partial state: one t-digest + one bucket histogram
    * per (part, colname) — built in plain Scala (no per-row aggregator
    * buffer serialization), merged associatively.
    */
  case class DriftPartial(part: String, colname: String,
                          sketch: Array[Byte], buckets: Map[Long, Long]) {
    def merge(o: DriftPartial): DriftPartial = {
      val td = TDigest.fromBytes(sketch).merge(TDigest.fromBytes(o.sketch))
      val b = (buckets.keySet ++ o.buckets.keySet).map(k =>
        k -> (buckets.getOrElse(k, 0L) + o.buckets.getOrElse(k, 0L))).toMap
      DriftPartial(part, colname, td.toBytes, b)
    }
  }

  /** Drift verdicts per partition: chi-square (bucketed counts vs baseline
    * proportions) + KS (t-digest CDFs) — both statistics from ONE narrow
    * pass that builds mergeable partials per input split, reduced per
    * (part, colname) (a KB-scale shuffle), final math on the driver. At
    * 10^12 rows the identical partials flow through the same
    * groupByKey/reduceGroups; only the final few-hundred-row collect ever
    * reaches the driver. With `baselineDir`, the reference histogram and
    * digests come from the persisted snapshot; otherwise the merged global
    * is the baseline. Returns (verdicts, violations).
    */
  /** One narrow pass over `images` building mergeable per-(part, colname)
    * partials (t-digest + bucket histogram), reduced per key (a KB-scale
    * shuffle) and collected — the only data that ever reaches the driver.
    */
  def collectPartials(images: DataFrame): Array[DriftPartial] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("part"), col("w").cast("double"), col("h").cast("double"))
      .as[(String, Double, Double)]
      .mapPartitions { it =>
        val tds = scala.collection.mutable.Map[(String, String), TDigest]()
        val hists = scala.collection.mutable.Map[(String, String), scala.collection.mutable.Map[Long, Long]]()
        def add(p: String, c: String, v: Double): Unit = {
          tds.getOrElseUpdate((p, c), new TDigest(100)).add(v)
          val h = hists.getOrElseUpdate((p, c), scala.collection.mutable.Map[Long, Long]())
          val b = math.floor(v / BucketWidth).toLong
          h(b) = h.getOrElse(b, 0L) + 1L
        }
        it.foreach { case (p, w, h) => add(p, "w", w); add(p, "h", h) }
        tds.iterator.map { case ((p, c), td) =>
          DriftPartial(p, c, td.toBytes, hists((p, c)).toMap)
        }
      }
      .groupByKey(x => (x.part, x.colname))
      .reduceGroups((a, b) => a.merge(b))
      .map(_._2)
      .collect()
  }

  /** Persist partials (ST2 resume: done partitions are never re-scanned for
    * drift — their sketches merge from this table instead). Dynamic
    * partition overwrite keyed by `part` so a crash-retry replaces the
    * crashed run's partials instead of duplicating them (a duplicate
    * partial would double that partition's histogram on merge).
    */
  def writePartials(spark: SparkSession, partials: Seq[DriftPartial], dir: String): Unit =
    if (partials.nonEmpty)
      PartitionedStore.write(
        spark.createDataset(partials)(org.apache.spark.sql.Encoders.product[DriftPartial]).toDF(),
        dir)

  def readPartials(spark: SparkSession, dir: String): Array[DriftPartial] = {
    // missing dir = first run; a genuine read error must propagate, not
    // silently drop the baseline contribution of done partitions
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) Array.empty
    else {
      import spark.implicits._
      spark.read.parquet(dir).as[DriftPartial].collect()
    }
  }

  def check(images: DataFrame, runId: String,
            baselineDir: Option[String] = None): (DataFrame, DataFrame) =
    verdictsFrom(images.sparkSession, collectPartials(images), runId, baselineDir)

  /** Drift verdicts from already-merged partials (fresh, persisted, or a
    * mix): chi-square vs baseline histogram + KS vs baseline digest.
    */
  def verdictsFrom(spark: SparkSession, merged: Array[DriftPartial], runId: String,
                   baselineDir: Option[String] = None): (DataFrame, DataFrame) = {
    import spark.implicits._
    // reference distribution: persisted snapshot, else merged global
    val (globalHist, globalDig): (Map[String, Map[Long, Long]], Map[String, TDigest]) =
      baselineDir.map { d =>
        val h = spark.read.parquet(s"$d/histogram")
          .as[(String, Long, Long)].collect()
          .groupBy(_._1).map { case (c, xs) => c -> xs.map(x => x._2 -> x._3).toMap }
        val g = spark.read.parquet(s"$d/digests").as[(String, Array[Byte])].collect()
          .map { case (c, b) => c -> TDigest.fromBytes(b) }.toMap
        (h, g)
      }.getOrElse {
        val byCol = merged.groupBy(_.colname)
        val h = byCol.map { case (c, xs) =>
          c -> xs.flatMap(_.buckets.toSeq).groupBy(_._1)
            .map { case (b, ys) => b -> ys.map(_._2).sum }
        }
        val g = byCol.map { case (c, xs) =>
          c -> xs.map(x => TDigest.fromBytes(x.sketch)).reduce(_ merge _)
        }
        (h, g)
      }

    val verdictRows = merged.toSeq.flatMap { p =>
      val g = globalHist(p.colname)
      val gTot = g.values.sum.toDouble
      val pTot = p.buckets.values.sum
      // normalized chi-square: raw statistic over the FULL union of baseline
      // and partition buckets, divided by the partition row count — a
      // scale-invariant effect size (see ImageSuite.DriftChi2Max). Buckets
      // observed outside the baseline's support get a half-count smoothed
      // expected value, so mass that drifted into novel buckets contributes
      // to the statistic instead of being silently dropped. `pTot.toDouble`
      // BEFORE the multiply: two large Longs would overflow at design scale.
      val chi2 = (g.keySet ++ p.buckets.keySet).toSeq.map { b =>
        val gCnt = g.getOrElse(b, 0L)
        val o = p.buckets.getOrElse(b, 0L).toDouble
        val e = if (gCnt > 0) pTot.toDouble * gCnt / gTot
                else pTot.toDouble * 0.5 / gTot // smoothed: novel support
        if (e > 0) (o - e) * (o - e) / e else 0.0
      }.sum / math.max(1L, pTot)
      val ks = TDigest.ks(TDigest.fromBytes(p.sketch), globalDig(p.colname))
      Seq(
        Verdict(p.part, s"drift_chi2_${p.colname}", chi2 <= ImageSuite.DriftChi2Max,
          chi2, ImageSuite.DriftChi2Max, pTot,
          if (chi2 <= ImageSuite.DriftChi2Max) 0L else 1L, runId),
        Verdict(p.part, s"drift_ks_${p.colname}", ks <= ImageSuite.DriftKsMax,
          ks, ImageSuite.DriftKsMax, pTot,
          if (ks <= ImageSuite.DriftKsMax) 0L else 1L, runId))
    }
    val verdicts = spark.createDataset(verdictRows).toDF()

    val violations = verdicts.filter(!col("pass"))
      .select(col("part"), lit("-").as("image_id"), col("check"),
        concat(lit("stat="), round(col("metric"), 4)).as("observed"),
        concat(lit("<= "), col("threshold")).as("expected"))
    (verdicts, violations)
  }
}
