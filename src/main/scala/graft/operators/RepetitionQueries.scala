package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-analysis operators over `documents` — the Gopher-style
  * repetition quality rules (Rae et al. 2021, appendix A1.1) and
  * substring-level exact dedup (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better") re-expressed as declarative Spark
  * plans. Reference analogues: the per-record text-quality gates
  * (`/root/reference/src/crawl_first/analysis.py:488-530`) generalized to
  * intra- and inter-document repetition, and the MD5 content-key
  * discipline (`cache.py:27-29`) reused as the span fingerprint.
  *
  * The corpus here has no newlines, so the line/paragraph rules don't
  * apply; the token/n-gram rules — the core of Gopher's repetition
  * section — are implemented exactly:
  *   - top-n-gram char fraction (n = 2, 3): chars of the most frequent
  *     n-gram (count × gram chars) over the doc's chars, tie-broken
  *     deterministically by (count DESC, gram ASC);
  *   - duplicated-n-gram fraction (n = 3): occurrence-weighted chars of
  *     grams seen ≥2× in the doc over all gram occurrences' chars. (A
  *     char-COVERAGE union, Gopher's exact wording, differs only for
  *     overlapping occurrences; the occurrence-weighted form is
  *     order-free and therefore bit-replayable in any engine.)
  *
  * Scale notes (10^12 docs):
  *   - gram explosion is linear in corpus tokens (n·tokens rows, n ≤ 3);
  *     the per-(doc, n, gram) count is combiner-friendly (map-side
  *     partials collapse within-doc repeats before the shuffle);
  *   - windows partition by (doc_id, n) — bounded by one doc's distinct
  *     grams, never a global sort;
  *   - substring dedup is the SAME shape as MinHash banding: one
  *     explode, one hash-shuffle on the 128-bit span key (combiner
  *     collapses within-partition repeats), one equi-join back — never
  *     all-pairs. The duplicated-span side is an aggregation output, so
  *     AQE upgrades the join to broadcast whenever it's small.
  */
object RepetitionQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Span width (tokens) for substring-level dedup. Lee et al. use 50
    * BPE tokens; 8 whitespace tokens is the same rule scaled to this
    * corpus' 10-99-token docs. */
  val SpanTokens = 8

  /** Gopher-style flag thresholds (top-2-gram / top-3-gram char fraction,
    * duplicated-3-gram occurrence fraction). */
  val Top2Max = 0.20
  val Top3Max = 0.18
  val Dup3Max = 0.10

  private def toksCol: Column =
    expr("filter(split(text, ' '), t -> length(t) > 0)")

  /** Per-doc Gopher repetition metrics. One gram explode (n = 2 and 3),
    * one count aggregation, two windows over (doc_id, n), one final
    * per-doc rollup — every stage keyed by doc_id so the shuffles are
    * hash-spread and each window group is one doc's gram census. */
  def repetitionMetrics(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val base = d.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).as("nch"), toksCol.as("toks"))
    val grams = base.join(broadcast(Seq(2, 3).toDF("n")))
      .filter(size(col("toks")) >= col("n"))
      .select(col("doc_id"), col("nch"), col("n"),
        explode(expr(
          "transform(sequence(1, size(toks) - n + 1), i -> concat_ws(' ', slice(toks, i, n)))"))
          .as("gram"))
    val counts = grams.groupBy("doc_id", "nch", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("glen", length(col("gram")))
    val part = Window.partitionBy("doc_id", "n")
    val ranked = counts
      .withColumn("rn", row_number().over(part.orderBy(col("cnt").desc, col("gram").asc)))
      .withColumn("total_w", sum(col("cnt") * col("glen")).over(part))
      .withColumn("dup_w",
        sum(when(col("cnt") >= 2, col("cnt") * col("glen")).otherwise(0L)).over(part))
      .filter(col("rn") === 1)
    val pivoted = ranked.groupBy("doc_id", "nch").agg(
      max(when(col("n") === 2, col("cnt") * col("glen"))).as("top2_w"),
      max(when(col("n") === 3, col("cnt") * col("glen"))).as("top3_w"),
      max(when(col("n") === 3, col("dup_w"))).as("dup3_w"),
      max(when(col("n") === 3, col("total_w"))).as("total3_w"))
    val top2 = coalesce(round(col("top2_w").cast("double") / col("b_nch"), 6), lit(0.0))
    val top3 = coalesce(round(col("top3_w").cast("double") / col("b_nch"), 6), lit(0.0))
    val dup3 = coalesce(round(col("dup3_w").cast("double") / col("total3_w").cast("double"), 6), lit(0.0))
    base.select(col("doc_id"), col("nch").as("b_nch"))
      .join(pivoted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        top2.as("top2_frac"), top3.as("top3_frac"), dup3.as("dup3_frac"),
        (top2 > Top2Max || top3 > Top3Max || dup3 > Dup3Max).as("repetitive"))
  }

  /** Substring-level exact dedup: every [[SpanTokens]]-token span is
    * fingerprinted (md5 over the joined tokens — the same content key as
    * exact dedup, at span granularity); a span duplicated ANYWHERE in the
    * corpus (count ≥ 2, same or different doc) flags all its positions,
    * and per doc the union of flagged [pos, pos+k-1] intervals is the
    * duplicated-token coverage. The union is exact: with flagged
    * positions sorted, each contributes min(k, next_pos − pos) tokens —
    * a lead window over (doc_id ORDER BY pos). */
  def substringDedup(d: DataFrame): DataFrame = {
    val k = SpanTokens
    val base = d.filter(col("text").isNotNull)
      .select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"), col("toks"))
    val spans = base.filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(1, n_tokens - $k + 1),
                i -> named_struct('pos', cast(i as bigint),
                                  'gh', md5(concat_ws(' ', slice(toks, i, $k)))))"""))
          .as("sp"))
      .select(col("doc_id"), col("sp.pos").as("pos"), col("sp.gh").as("gh"))
    val dupSpans = spans.groupBy("gh").agg(count(lit(1)).as("gcnt"))
      .filter(col("gcnt") >= 2).select("gh")
    val flagged = spans.join(dupSpans, Seq("gh"))
      .withColumn("nxt", lead(col("pos"), 1)
        .over(Window.partitionBy("doc_id").orderBy("pos")))
    val cov = flagged.groupBy("doc_id").agg(
      count(lit(1)).as("c_spans"),
      sum(least(lit(k.toLong), coalesce(col("nxt") - col("pos"), lit(k.toLong))))
        .as("c_covered"))
    base.select("doc_id", "n_tokens")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("c_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("c_covered"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("c_covered"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_repetition" -> ((s, dir) =>
      repetitionMetrics(s, docs(s, dir)).orderBy("doc_id")),
    "q_dedup_substring" -> ((s, dir) =>
      substringDedup(docs(s, dir)).orderBy("doc_id"))
  )

  /** DuckDB CTE chain computing one `rep` row per doc of `src` (needs
    * doc_id + text): the metric twin of [[repetitionMetrics]],
    * parameterized by its source so `Pipeline`'s end-to-end oracle can
    * replay the SAME fragment over its gated CTE (the discipline
    * `DedupQueries.minhashLshCte` established). */
  def repetitionCteSql(src: String): String =
    s"""rep_d AS (
         SELECT doc_id, length(text) AS nch,
                list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
         FROM $src WHERE text IS NOT NULL AND length(text) > 0),
       rep_ns(n) AS (VALUES (2), (3)),
       rep_g AS (
         SELECT doc_id, nch, n,
                array_to_string(list_slice(toks, i, i + n - 1), ' ') AS gram
         FROM rep_d, rep_ns, UNNEST(range(1, len(toks) - n + 2)) AS s(i)
         WHERE len(toks) >= n),
       rep_c AS (
         SELECT doc_id, nch, n, gram, count(*) AS cnt, length(gram) AS glen
         FROM rep_g GROUP BY ALL),
       rep_r AS (
         SELECT doc_id, nch, n, cnt, glen,
                row_number() OVER (PARTITION BY doc_id, n
                                   ORDER BY cnt DESC, gram ASC) AS rn,
                sum(cnt * glen) OVER (PARTITION BY doc_id, n) AS total_w,
                sum(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END)
                  OVER (PARTITION BY doc_id, n) AS dup_w
         FROM rep_c),
       rep_p AS (
         SELECT doc_id AS p_id,
           round(CAST(max(CASE WHEN n = 2 THEN cnt * glen END) AS DOUBLE) / nch, 6) AS p_top2,
           round(CAST(max(CASE WHEN n = 3 THEN cnt * glen END) AS DOUBLE) / nch, 6) AS p_top3,
           round(coalesce(CAST(max(CASE WHEN n = 3 THEN dup_w END) AS DOUBLE)
             / CAST(max(CASE WHEN n = 3 THEN total_w END) AS DOUBLE), 0.0), 6) AS p_dup3
         FROM rep_r WHERE rn = 1 GROUP BY doc_id, nch),
       rep AS (
         SELECT d.doc_id AS rep_id,
           coalesce(p.p_top2, 0.0) AS top2_frac,
           coalesce(p.p_top3, 0.0) AS top3_frac,
           coalesce(p.p_dup3, 0.0) AS dup3_frac,
           (coalesce(p.p_top2, 0.0) > $Top2Max OR coalesce(p.p_top3, 0.0) > $Top3Max
              OR coalesce(p.p_dup3, 0.0) > $Dup3Max) AS repetitive
         FROM rep_d d LEFT JOIN rep_p p ON d.doc_id = p.p_id)"""

  def oracleSql: Map[String, String] = Map(
    "q_text_repetition" ->
      s"""WITH ${repetitionCteSql("documents")}
         SELECT rep_id AS doc_id, top2_frac, top3_frac, dup3_frac, repetitive
         FROM rep""",
    "q_dedup_substring" ->
      """WITH d AS (
           SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
           FROM documents WHERE text IS NOT NULL),
         base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM d),
         g AS (
           SELECT doc_id, i AS pos,
                  md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gh
           FROM base, UNNEST(range(1, n_tokens - 8 + 2)) s(i)
           WHERE n_tokens >= 8),
         dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
         f AS (
           SELECT g.doc_id, g.pos,
                  lead(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS nxt
           FROM g JOIN dup USING (gh)),
         cov AS (
           SELECT doc_id AS c_id, count(*) AS n_dup_spans,
                  CAST(sum(least(8, coalesce(nxt - pos, 8))) AS BIGINT) AS covered_tokens
           FROM f GROUP BY 1)
         SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           round(CAST(coalesce(c.covered_tokens, 0) AS DOUBLE) / b.n_tokens, 6) AS dup_token_frac
         FROM base b LEFT JOIN cov c ON b.doc_id = c.c_id"""
  )
}
