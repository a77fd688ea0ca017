package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic model-based quality filter (VERDICT r4 #6): a hashed-ngram
  * linear scorer — the fastText-style classifier real LLM curation stacks
  * run beside the heuristic gates (Joulin et al., "Bag of Tricks for
  * Efficient Text Classification", 2016; the hashing trick per Weinberger
  * et al., 2009), with FIXED SEEDED weights so both engines replay it
  * bit-for-bit. Reference analogue: deterministic score composition
  * (validation_agent.py:422-424).
  *
  * Features: lowercased unigrams + adjacent bigrams, hashed to
  * [[Buckets]] buckets via an md5 prefix (collisions are the hashing
  * trick, not a bug). Weights: one signed byte per bucket, derived from
  * md5("w:" + bucket) — the "trained model" stand-in, a pure function of
  * the bucket id. The raw score is an exact BIGINT sum, so the KEEP
  * decision (mean weight > [[KeepMeanMin]]) is integer-exact —
  * cross-engine hash-stable with no FP anywhere in the decision; the
  * reported sigmoid score is informational (rounded to 6).
  *
  * Scale: a narrow per-row projection — grams, hashes, and the weight sum
  * all inside one codegen'd map over the scan; no shuffle, no model side
  * table (weights derive from the hash), nothing collected.
  */
object QualityClassifier {

  val Buckets = 4096
  /** keep ⇔ raw > KeepMeanMin · n_grams (mean signed-byte weight floor). */
  val KeepMeanMin = -8L
  /** Sigmoid temperature for the reported score. */
  val Temp = 32.0

  /** Unigrams + adjacent bigrams (joined with '_') of the lowercased text. */
  def grams(text: Column): Column = {
    val ws = BpeTokenizer.wordsOf(text)
    val bi = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (x, y) => concat(x, lit("_"), y))
    concat(ws, bi)
  }

  /** Feature bucket of one gram: md5-prefix hash mod [[Buckets]]. */
  private def bucket(g: Column): Column =
    conv(substring(md5(g), 1, 4), 16, 10).cast("int") % Buckets

  /** Seeded signed-byte weight of a bucket: md5("w:"+bucket) byte − 128. */
  private def weight(g: Column): Column =
    conv(substring(md5(concat(lit("w:"), bucket(g).cast("string"))), 1, 2),
      16, 10).cast("int") - lit(128)

  /** Exact BIGINT feature-weight sum over the doc's grams. */
  def rawScore(text: Column): Column =
    aggregate(transform(grams(text), g => weight(g).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def nGrams(text: Column): Column = size(grams(text)).cast("long")

  /** The integer-exact keep decision (sigmoid(raw/(n·Temp)) thresholding
    * reduces to this linear form — no FP in the gate). */
  def keep(text: Column): Column =
    rawScore(text) > lit(KeepMeanMin) * nGrams(text)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_classifier" -> ((s, dir) => {
      // explode + map-side-partial aggregate instead of the per-row
      // `aggregate(transform(...))` fold: higher-order-function lambdas
      // are CodegenFallback, so the fold ran INTERPRETED per gram — and
      // twice per row (raw + the score recompute). Exploded, each gram's
      // seeded weight is one codegen'd md5 projection and the BIGINT sum
      // is order-free (exact integers, identical totals). A null-filtered
      // doc always tokenizes to ≥1 gram (the DuckDB twin's unnest drops
      // empty docs and has always hash-matched), so explode ≡
      // explode_outer on this corpus.
      val g = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(grams(col("text"))).as("g"))
      g.select(col("doc_id"), weight(col("g")).cast("long").as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1L)).as("n_grams"), sum(col("w")).as("raw"))
        .select(col("doc_id"), col("n_grams"), col("raw"),
          round(lit(1.0) / (lit(1.0) +
            exp(-col("raw").cast("double") /
              (col("n_grams").cast("double") * Temp))), 6).as("score"),
          (col("raw") > lit(KeepMeanMin) * col("n_grams")).as("keep"))
        .orderBy("doc_id")
    })
  )

  /** Shared SQL: per-doc (n_grams, raw) over a docs CTE named `srcCte`
    * with (doc_id, text) — unigram/bigram unnest + the same seeded
    * weights; the sum is order-free (exact integers).
    */
  def scoreCteSql(srcCte: String): String =
    s"""cw AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
             x -> length(x) > 0) AS ws
         FROM $srcCte),
       cg AS (
         SELECT doc_id, g FROM (SELECT doc_id, unnest(ws) AS g FROM cw)
         UNION ALL
         SELECT doc_id, s1 || '_' || s2 AS g FROM (
           SELECT doc_id, unnest(ws[1:len(ws)-1]) AS s1,
             unnest(ws[2:len(ws)]) AS s2 FROM cw)),
       clf AS (
         SELECT doc_id, count(*) AS n_grams,
           CAST(sum(
             CAST(('0x' || substr(md5('w:' || CAST(
               CAST(('0x' || substr(md5(g), 1, 4)) AS INT) % $Buckets
             AS VARCHAR)), 1, 2)) AS INT) - 128
           ) AS BIGINT) AS raw
         FROM cg GROUP BY 1)"""

  def oracleSql: Map[String, String] = Map(
    "q_curate_classifier" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         ${scoreCteSql("d")}
         SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, raw,
           round(1.0 / (1.0 + exp(-CAST(raw AS DOUBLE)
             / (CAST(n_grams AS DOUBLE) * $Temp))), 6) AS score,
           raw > $KeepMeanMin * n_grams AS keep
         FROM clf"""
  )
}
