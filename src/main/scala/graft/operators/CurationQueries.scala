package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators over `documents` — the sampling / capping /
  * packing layer a training-data pipeline runs AFTER quality gating and
  * dedup. Reference analogues: bounded per-entity fan-out
  * (`/root/reference/src/crawl_first/osm.py:630-655` keeps the closest
  * feature per name — a per-key cap with a deterministic order),
  * `random.sample` subsetting (`cli.py:21-31`) and the md5 content-key
  * discipline that makes it replayable (`cache.py:27-29`), and the
  * fixed-budget batching of downstream work (`Makefile:124`).
  *
  * Everything here is integer/hash-deterministic — window ranks over
  * total-ordered keys, md5-prefix thresholds, integer running sums — so
  * every operator is DuckDB-oracle-able bit-for-bit, and everything stays
  * in whole-stage codegen (builtin functions only, no UDF).
  *
  * Scale notes (10^12 rows):
  *  - source-cap and packing windows partition by a BOUNDED key (source /
  *    shard), never a global ORDER BY — each window group is one reducer's
  *    work and groups are hash-spread; no single-partition sort anywhere.
  *  - stratified sampling is a pure per-row predicate (md5 prefix vs a
  *    broadcast rate row) — zero shuffles, fully pushable past scans of
  *    any source that stores `lang` as a partition column.
  *  - packing's shard count is the parallelism knob: shards are
  *    independent, so 4096 shards spread a 10^12-doc pack over 4096
  *    reducers with bounded memory (one running sum each).
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Per-source document cap. */
  val SourceCap = 40

  /** Per-language stratified keep-rates, in 1/256ths of the md5-prefix
    * space. Deliberately uneven — the shape of a real rebalancing pass
    * (downsample the dominant language, keep the rest). */
  val StratRates256: Seq[(String, Int)] =
    Seq("en" -> 32, "es" -> 128, "de" -> 160, "fr" -> 192, "zh" -> 256)

  /** Token budget per packed training sequence. */
  val PackBudget = 2048

  /** Shard count for the packing pass — the scale-out knob. */
  val PackShards = 32

  /** Per-source rate cap core: keep at most SourceCap docs per source, by
    * (n_chars DESC, doc_id ASC) — longest-first with a total tie-break,
    * so the rank is unique and the survivor set deterministic. One
    * shuffle on `source`; a hot source is ONE reducer's rank scan (the
    * cap bounds its output, and rank streams — no buffering).
    */
  def sourceCap(d: DataFrame): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SourceCap)
      .select("doc_id", "source", "n_chars", "rk")
  }

  /** Stratified-sampling core: keep a doc iff the first md5 byte of its
    * id is below the language's rate. Pure per-row predicate + one
    * broadcast rates row — zero data shuffles (PlanHygieneSpec-asserted),
    * and the SAME doc set is kept on any cluster size or partitioning.
    */
  def stratifiedSample(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val rates = broadcast(StratRates256.toDF("r_lang", "rate256"))
    d.join(rates, col("lang") === col("r_lang"), "left")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") < coalesce(col("rate256"), lit(0)))
      .select("doc_id", "lang", "source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_curate_source_cap" -> ((s, dir) =>
      sourceCap(docs(s, dir)).orderBy("doc_id")),

    "q_curate_stratified" -> ((s, dir) =>
      stratifiedSample(s, docs(s, dir)).orderBy("doc_id")),

    // Weighted sample without replacement (Efraimidis–Spirakis A-ES,
    // md5-deterministic): documents drawn proportional to length —
    // quality-weighted thinning that replays bit-identically. Top-k is
    // TakeOrderedAndProject (per-partition heaps), never a global sort.
    "q_curate_weighted_sample" -> ((s, dir) =>
      operators.Sampling.weightedTopK(docs(s, dir), col("doc_id"), "n_chars", k = 100)
        .select("doc_id", "source", "n_chars", "sample_key")),

    // Audit twin of the stratified sample: kept/total/realized-rate per
    // language — the report a curation run ships with its manifest.
    "q_curate_strat_audit" -> ((s, dir) => {
      import s.implicits._
      val rates = broadcast(StratRates256.toDF("r_lang", "rate256"))
      docs(s, dir)
        .join(rates, col("lang") === col("r_lang"), "left")
        .withColumn("kept",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("int") < coalesce(col("rate256"), lit(0))).cast("int"))
        .groupBy("lang")
        .agg(count(lit(1)).as("total"), sum("kept").as("kept"),
          round(sum("kept").cast("double") / count(lit(1)), 6).as("realized_rate"))
        .orderBy("lang")
    }),

    // Sequence packing (greedy concat-and-chunk): docs are concatenated
    // in (shard, doc_id) order and cut into PackBudget-token bins; a doc
    // belongs to the bin where its first token lands, so bins overflow by
    // at most one doc's tokens (the standard pretraining concat-pack).
    // tok_count is the same BPE-ish regex as q_text_tokens. The window
    // partitions by shard — integer running sum per reducer, O(1) state.
    "q_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards)).as("shard"),
          size(regexp_extract_all(col("text"), lit(TextQueries.TokenPattern), lit(0)))
            .cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .select(col("doc_id"), col("shard"), col("tok"),
          floor((col("cum") - col("tok")) / lit(PackBudget)).as("bin"))
        .orderBy("doc_id")
    }),

    // Packed-bin audit: docs-per-bin and fill factor. Fill can exceed 1.0
    // only on a bin whose LAST doc spilled over the boundary — the
    // documented overflow bound; min/max fill is what a batch-size SLO
    // would alarm on.
    "q_pack_stats" -> ((s, dir) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards)).as("shard"),
          size(regexp_extract_all(col("text"), lit(TextQueries.TokenPattern), lit(0)))
            .cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .withColumn("bin", floor((col("cum") - col("tok")) / lit(PackBudget)))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
          round(sum("tok").cast("double") / PackBudget, 6).as("fill"))
        .orderBy("shard", "bin")
    }),

    "q_curate_token_budget" -> ((s, dir) =>
      tokenBudget(docs(s, dir)).orderBy("source", "cum")),

    // Mixture audit: what the budgeted selection actually achieved —
    // per-source selected docs/tokens, fill vs budget, and the realized
    // share of the composed corpus (the number the mixture spec is ABOUT).
    "q_curate_mixture_audit" -> ((s, dir) => {
      val sel = tokenBudget(docs(s, dir))
        .groupBy("source")
        .agg(max("budget").as("budget"), count(lit(1)).as("n_docs"),
          sum("tok").as("tok_sel"))
      sel.withColumn("fill",
          round(col("tok_sel").cast("double") / col("budget"), 6))
        .withColumn("share",
          round(col("tok_sel").cast("double") /
            sum("tok_sel").over(Window.partitionBy()), 6))
        .orderBy("source")
    })
  )

  /** Per-source TOKEN budgets for mixture composition: even-numbered
    * sources get [[BudgetEven]] tokens, odd [[BudgetOdd]] — the shape of a
    * real mixture spec ("30% web, 10% code, …" expressed as absolute
    * token targets per source). A pure function of the source name so
    * both engines derive it without a side table. */
  val BudgetEven = 400L
  val BudgetOdd = 150L

  /** Token-budget mixture composition — the op that turns a mixture spec
    * into a concrete document selection: within each source, walk docs in
    * deterministic hash order (md5(doc_id) — an unbiased shuffle both
    * engines replay) accumulating tokens, and keep every doc that STARTS
    * before the source's budget is exhausted (overflow ≤ one doc, the
    * same convention as sequence packing). One shuffle on `source`; a hot
    * source is one reducer's streaming scan. At 10^12 docs you pre-thin
    * each source first with the md5-prefix gate at rate ≈ safety ×
    * budget / (avg_tok × |source|) (the [[stratifiedSample]] predicate),
    * so the window only ever sorts a budget-proportional candidate set —
    * the same two-phase shape documented on `stratifiedExactK`.
    */
  def tokenBudget(d: DataFrame): DataFrame = {
    val budget = when(substring(col("source"), 4, 10).cast("int") % 2 === 0,
      lit(BudgetEven)).otherwise(lit(BudgetOdd))
    val w = Window.partitionBy("source")
      .orderBy(col("hx"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit(TextQueries.TokenPattern), lit(0)))
          .cast("long").as("tok"),
        md5(col("doc_id").cast("string")).as("hx"))
      .withColumn("budget", budget)
      .withColumn("cum", sum("tok").over(w))
      .filter(col("cum") - col("tok") < col("budget"))
      .select("doc_id", "source", "tok", "cum", "budget")
  }

  def oracleSql: Map[String, String] = Map(
    "q_curate_source_cap" ->
      s"""SELECT doc_id, source, n_chars, rk FROM (
            SELECT doc_id, source, n_chars,
              row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id ASC) AS rk
            FROM documents) ranked
          WHERE rk <= $SourceCap""",
    "q_curate_stratified" ->
      s"""WITH rates(r_lang, rate256) AS (VALUES
            ('en', 32), ('es', 128), ('de', 160), ('fr', 192), ('zh', 256))
          SELECT doc_id, lang, source
          FROM documents LEFT JOIN rates ON lang = r_lang
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                < coalesce(rate256, 0)""",
    "q_curate_weighted_sample" ->
      s"""WITH w AS (
            SELECT doc_id, source, n_chars,
              ${operators.Sampling.duckUSql("doc_id")} AS u,
              CAST(n_chars AS DOUBLE) AS wt
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0)
          SELECT doc_id, source, n_chars, round(ln(u) / wt, 6) AS sample_key
          FROM w
          ORDER BY ln(u) / wt DESC, doc_id ASC
          LIMIT 100""",
    "q_curate_strat_audit" ->
      s"""WITH rates(r_lang, rate256) AS (VALUES
            ('en', 32), ('es', 128), ('de', 160), ('fr', 192), ('zh', 256))
          SELECT lang, count(*) AS total,
            CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                  < coalesce(rate256, 0) THEN 1 ELSE 0 END) AS BIGINT) AS kept,
            round(CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                  < coalesce(rate256, 0) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
              AS realized_rate
          FROM documents LEFT JOIN rates ON lang = r_lang
          GROUP BY lang""",
    "q_pack_sequences" ->
      s"""WITH toks AS (
            SELECT doc_id, doc_id % $PackShards AS shard,
              CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok
            FROM documents WHERE text IS NOT NULL)
          SELECT doc_id, shard, tok,
            CAST(floor(CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - tok AS DOUBLE) / $PackBudget) AS BIGINT) AS bin
          FROM toks""",
    "q_pack_stats" ->
      s"""WITH toks AS (
            SELECT doc_id, doc_id % $PackShards AS shard,
              CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok
            FROM documents WHERE text IS NOT NULL),
          binned AS (
            SELECT doc_id, shard, tok,
              CAST(floor(CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) - tok AS DOUBLE) / $PackBudget) AS BIGINT) AS bin
            FROM toks)
          SELECT shard, bin, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
            round(CAST(sum(tok) AS DOUBLE) / $PackBudget, 6) AS fill
          FROM binned GROUP BY shard, bin""",
    "q_curate_token_budget" ->
      s"""WITH t AS (
            SELECT doc_id, source,
              CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok,
              md5(CAST(doc_id AS VARCHAR)) AS hx,
              CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                   THEN $BudgetEven ELSE $BudgetOdd END AS budget
            FROM documents WHERE text IS NOT NULL),
          c AS (
            SELECT doc_id, source, tok, budget,
              sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
          SELECT doc_id, source, tok, CAST(cum AS BIGINT) AS cum,
            CAST(budget AS BIGINT) AS budget
          FROM c WHERE cum - tok < budget""",
    "q_curate_mixture_audit" ->
      s"""WITH t AS (
            SELECT doc_id, source,
              CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok,
              md5(CAST(doc_id AS VARCHAR)) AS hx,
              CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                   THEN $BudgetEven ELSE $BudgetOdd END AS budget
            FROM documents WHERE text IS NOT NULL),
          c AS (
            SELECT doc_id, source, tok, budget,
              sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t),
          sel AS (
            SELECT source, CAST(max(budget) AS BIGINT) AS budget,
              count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_sel
            FROM c WHERE cum - tok < budget GROUP BY source)
          SELECT source, budget, n_docs, tok_sel,
            round(CAST(tok_sel AS DOUBLE) / budget, 6) AS fill,
            round(CAST(tok_sel AS DOUBLE) / sum(tok_sel) OVER (), 6) AS share
          FROM sel"""
  )
}
