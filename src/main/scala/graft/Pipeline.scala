package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the library driven the way
  * the reference's CLI drives its enrichment loop (SURVEY §3.1
  * ingest → enrich → derive → write), composed entirely from the operators
  * the oracle gate verifies:
  *
  *   1. ingest  — documents scan (pruned columns);
  *   2. enrich  — token/quality/fingerprint metrics (one narrow pass);
  *   3. gate    — quality thresholds (pushed-down predicates);
  *   4. dedup   — exact (content digest) then near-dup (MinHash+LSH
  *                banding, est. Jaccard ≥ 0.5, keep the smaller doc_id);
  *   5. write   — curated parquet partitioned by lang + a per-stage
  *                lineage table (rows in/out per stage — the reference's
  *                summary-stats discipline, analysis.py:1252-1267).
  *
  * Every stage is a DataFrame transform — Catalyst fuses the enrich+gate
  * projections into the scan, and the dedup joins shuffle on digest /
  * (band, bucket) only. Usage: Pipeline <sfDir> <outDir>
  */
object Pipeline {

  case class StageCount(stage: String, n_rows: Long, note: String)

  def curate(spark: SparkSession, sfDir: String): (DataFrame, Seq[StageCount]) = {
    import spark.implicits._
    val stages = Seq.newBuilder[StageCount]

    // 1. ingest
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .filter(col("text").isNotNull)
    stages += StageCount("ingest", docs.count(), "documents with text")

    // 2. enrich: token counts, quality ratios, content fingerprint
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(TextQueries.Stopwords.map(lit(_)): _*)))
    val enriched = docs
      .withColumn("n_tokens", nTok)
      .withColumn("stopword_ratio", nStop.cast("double") / nTok.cast("double"))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / length(col("text")).cast("double"))
      .withColumn("content_md5", md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
    stages += StageCount("enrich", enriched.count(), "token/quality/fingerprint columns")

    // 3. quality gate — cached: every later stage (and the final write)
    // would otherwise re-run the scan+enrich chain per action
    val gated = enriched.filter(
      col("n_tokens") >= 5 && col("punct_ratio") <= 0.2 && col("stopword_ratio") <= 0.8)
      .cache()
    stages += StageCount("quality_gate", gated.count(),
      "n_tokens>=5, punct<=0.2, stopword<=0.8")

    // 4a. exact dedup: keep min doc_id per content digest
    val keepExact = gated.groupBy("content_md5").agg(min("doc_id").as("doc_id"))
    val exactDeduped = gated.join(keepExact, Seq("content_md5", "doc_id"))
    stages += StageCount("dedup_exact", exactDeduped.count(), "keep min doc_id per md5")

    // 4b. near-dup: MinHash+LSH candidates with est. Jaccard >= 0.5 —
    // drop the larger id of each pair
    val nearPairs = DedupQueries.queries("q_dedup_minhash_lsh")(spark, sfDir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("b_id").as("doc_id")).distinct()
    // cached: the lineage count and the caller's write would otherwise each
    // re-execute the whole MinHash+LSH banding chain
    val curated = exactDeduped.join(nearPairs, Seq("doc_id"), "left_anti").cache()
    stages += StageCount("dedup_near", curated.count(), "minhash-lsh est_jaccard>=0.5")

    (curated, stages.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "target/pipeline-out"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (curated, stages) = curate(spark, sfDir)
    curated.write.mode(SaveMode.Overwrite).partitionBy("lang")
      .parquet(s"$outDir/curated")
    spark.createDataset(stages).toDF()
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineage")
    stages.foreach(s => println(f"PIPELINE ${s.stage}%-14s ${s.n_rows}%8d  ${s.note}"))
    spark.stop()
  }
}
