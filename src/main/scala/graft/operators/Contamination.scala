package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents whose word
  * n-grams overlap a held-out evaluation set above a threshold (the
  * standard train/test-contamination check a pretraining pipeline runs
  * before shipping a corpus; the n-gram-overlap formulation follows the
  * published GPT-3/PaLM appendix methodology).
  *
  * Reference analogue: the held-out/except discipline of
  * `/root/reference/src/crawl_first/cli.py:21-31` (deterministic subset
  * selection) combined with the membership-check shape of
  * `cache.py:27-44` — here the "benchmark" is a deterministic md5 slice
  * of `documents` (no external data in this sandbox; the slice stands in
  * for an eval suite, and the operator only ever sees it as "a table of
  * n-grams", which is exactly what a real eval set would be).
  *
  * Two-pass sketch-then-confirm, the same discipline as
  * [[TextQueries]]' heavy hitters:
  *
  *  - PASS 1 (nomination, the 10^12-row leg): per doc, build the
  *    distinct n-gram array with higher-order functions and count Bloom
  *    hits against a driver-built filter of the benchmark's n-grams —
  *    `size(filter(grams, g -> might_contain(bf, xxhash64(g))))`. No
  *    explode, no join, no shuffle: one codegen'd projection over the
  *    corpus (PlanHygieneSpec-asserted). Bloom has no false negatives,
  *    so `bloom_hits >= true_hits` and thresholding on it keeps a
  *    SUPERSET of the truly contaminated docs (spec-proven).
  *  - PASS 2 (confirmation): only the nominated slice explodes its
  *    n-grams and inner-joins the (small, broadcast) benchmark n-gram
  *    table for the exact overlap count. Output is exact, so it
  *    hash-matches a plain DuckDB NOT-IN-free replay.
  *
  * At 100 TB: the benchmark n-gram set is bounded by the eval suite
  * (~10^6 n-grams, a ~1 MB filter at 1% FPP); pass 1 touches every doc
  * but moves nothing; pass 2's explode+join sees only docs that share
  * n-grams with the benchmark — at a typical contamination rate (<<1%)
  * that is a vanishing fraction of the corpus.
  */
object Contamination {

  /** Word n-gram size (the corpus' planted near-dups share 5-gram runs;
    * real deployments use 8-13). */
  val N = 5

  /** Contamination threshold: flagged iff ≥ Tau of the doc's distinct
    * n-grams appear in the benchmark set. */
  val Tau = 0.2

  /** Deterministic held-out slice standing in for the eval set (~1/16
    * of doc ids by md5 prefix). */
  def isBench(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1) === "0"

  /** Distinct word N-grams of `text` as an array column (docs with
    * fewer than N tokens contribute none — callers pre-filter). */
  def ngrams(text: Column): Column = {
    val ts = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), size(ts) - N),
      i => concat_ws(" ", slice(ts, i + lit(1), lit(N)))))
  }

  /** (probe docs with gram arrays, distinct benchmark n-gram table). */
  private def prepared(d: DataFrame): (DataFrame, DataFrame) = {
    // widen: the per-doc n-gram build (interpreted transform lambda) and
    // the Bloom probe are the CPU of pass 1 and the scan is one task.
    // persist: the gram arrays feed three branches (benchmark table,
    // nomination scan, confirm explode) and were being rebuilt per branch.
    val withG = graft.Par.widen(d).filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= N)
      .select(col("doc_id"), ngrams(col("text")).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = withG.filter(isBench(col("doc_id")))
      .select(explode(col("grams")).as("g")).distinct()
    (withG.filter(!isBench(col("doc_id"))), bench)
  }

  /** Pass 1 core: probe docs with distinct-n-gram count and Bloom hit
    * count — deterministic (Bloom insertion is an OR of bits, so the
    * filter is independent of partitioning/merge order). */
  private def nominateFrom(probe: DataFrame, bench: DataFrame): DataFrame = {
    val bf = BloomAntiJoin.buildFilter(bench, col("g"),
      expectedItems = 1L << 20, numBits = 1L << 23)
    probe
      .withColumn("n_ngrams", size(col("grams")).cast("long"))
      .withColumn("bloom_hits",
        size(filter(col("grams"), g => BloomAntiJoin.mightContain(bf, g))).cast("long"))
  }

  def nominate(d: DataFrame): DataFrame = {
    val (probe, bench) = prepared(d)
    nominateFrom(probe, bench)
  }

  /** Full two-pass decontamination listing: exactly the docs whose TRUE
    * overlap fraction ≥ Tau, with exact counts. localCheckpoint pins the
    * benchmark n-gram table so the eval-set scan runs ONCE (it feeds
    * both the filter build and the confirm join); the table is bounded
    * by the eval suite, so executor-local materialization is cheap. */
  def contaminated(d: DataFrame): DataFrame = {
    val (probe, bench0) = prepared(d)
    // persist (not localCheckpoint): same run-once pinning for the two
    // consumers (filter build + confirm join) without the eager
    // RDD-materialization pass, which priced at 2.6 s of this query
    val bench = bench0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val suspicious = nominateFrom(probe, bench)
      .filter(col("bloom_hits").cast("double") >= col("n_ngrams") * Tau)
    suspicious
      .select(col("doc_id"), col("n_ngrams"), explode(col("grams")).as("g"))
      .join(broadcast(bench), "g")
      .groupBy("doc_id", "n_ngrams")
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("frac",
        round(col("n_overlap").cast("double") / col("n_ngrams"), 6))
      .filter(col("frac") >= Tau)
      .select("doc_id", "n_ngrams", "n_overlap", "frac")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_decontaminate" -> ((s, dir) =>
      contaminated(Tables(s, dir, "documents")).orderBy("doc_id"))
  )

  def oracleSql: Map[String, String] = Map(
    // plain replay: the Bloom pass is internal (sound nomination only),
    // so the exact output must equal the sketch-free computation
    "q_curate_decontaminate" ->
      s"""WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts,
              substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_bench
            FROM documents WHERE text IS NOT NULL),
          sh AS (
            SELECT DISTINCT doc_id, is_bench,
              ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||ts[i+3]||' '||ts[i+4] AS g
            FROM toks, UNNEST(range(1, len(ts)-3)) AS u(i)
            WHERE len(ts) >= $N),
          bench AS (SELECT DISTINCT g FROM sh WHERE is_bench),
          probe AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
              CAST(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap
            FROM sh WHERE NOT is_bench GROUP BY 1)
          SELECT doc_id, n_ngrams, n_overlap,
            round(CAST(n_overlap AS DOUBLE) / n_ngrams, 6) AS frac
          FROM probe
          WHERE round(CAST(n_overlap AS DOUBLE) / n_ngrams, 6) >= $Tau"""
  )
}
