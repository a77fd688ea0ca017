package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT similarity self-joins that scale WITHOUT hashing error — the
  * deterministic complements of the sketch rungs in [[DedupQueries]]
  * (MinHash/SimHash trade exactness for speed; these keep exactness and
  * get speed from candidate pruning instead):
  *
  *   - prefix-filtered set-similarity join (AllPairs; Bayardo/Ma/Srikant,
  *     "Scaling up all pairs similarity search", WWW 2007; SSJoin,
  *     Chaudhuri/Ganti/Kaushik, ICDE 2006): every pair meeting Jaccard ≥ t
  *     shares a token in both docs' rare-token PREFIXES, so the only join
  *     is an equi-join on prefix tokens — never all-pairs;
  *   - segment-based edit-distance join (PassJoin; Li/Deng/Wang/Feng,
  *     "PASS-JOIN: a partition-based method for similarity joins",
  *     VLDB 2012): if ed(a,b) ≤ k then b contains one of a's k+1
  *     segments verbatim within a ±k position window (pigeonhole — at
  *     most k edits cannot touch all k+1 segments), so candidates come
  *     from an equi-join on (length, segment-index, substring) keys.
  *
  * Reference analogue: near-duplicate suppression over crawled captions
  * (`/root/reference/src/crawl_first/osm.py:639-655` dedup-by-membership),
  * upgraded from exact-match to bounded-error matching.
  *
  * Scale notes (100 TB):
  *   - AllPairs: one shuffle to attach global token document-frequencies,
  *     one doc-sized sort per row (inside a projection — no global rank;
  *     ANY total order is correct, df-order merely minimizes prefix
  *     selectivity), one equi-join on prefix tokens, then intersection
  *     counting ONLY on surviving candidate pairs. The all-pairs DuckDB
  *     oracle is the fenced ground truth, never the production path.
  *   - PassJoin: segment/substring enumeration is O(k²·len) rows per doc
  *     (linear in data, independent of corpus size); the candidate join is
  *     an equi-join on (La, seg, substring); the verify step runs the
  *     codegen'd `levenshtein` builtin on candidates only.
  */
object SetSimilarity {

  // ---------------------------------------------------------------------
  // Prefix-filtered exact Jaccard self-join (AllPairs)
  // ---------------------------------------------------------------------

  /** Exact-Jaccard near-dup pairs at threshold `t` over distinct 3-token
    * shingles, with AllPairs prefix filtering for candidate generation.
    *
    * Correctness of the filter (standard AllPairs argument): order all
    * tokens by a global total order (document frequency, then token).
    * For a doc with n tokens the prefix is its first n − ⌈t·n⌉ + 1
    * tokens. If J(a,b) ≥ t then c = |A∩B| ≥ t·(na+nb)/(1+t) ≥ t·max(na,nb),
    * so the FIRST common token w (in global order) sits at position
    * ≤ n − c + 1 ≤ n − ⌈t·n⌉ + 1 in BOTH docs — i.e. inside both
    * prefixes — and the prefix equi-join finds the pair. Exact, not
    * probabilistic.
    *
    * Output: (a_id, b_id, common, a_sz, b_sz, jaccard) for pairs with
    * J ≥ t, ordered by (a_id, b_id). Identical to the all-pairs ground
    * truth by the argument above.
    */
  def prefixJaccardPairs(docs: DataFrame, t: Double): DataFrame = {
    // shingles feed FIVE plan branches (df counts, per-doc prefix build,
    // sizes, both sides of the verification join): persist the widened
    // frame so the explode+distinct runs once on all cores instead of
    // five times on the single-row-group scan's one task (blocks are
    // dropped by the bench between queries / the ContextCleaner after).
    val sh = DedupQueries.shingles(graft.Par.widen(docs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // global token order = (document frequency asc, shingle asc): rare
    // tokens first minimizes candidates. Attached by ONE equi-join on
    // shingle; the order is realized per-doc by an array sort (doc-sized),
    // NOT a global rank — no single-reducer window anywhere.
    val freq = sh.groupBy("shingle").agg(count(lit(1L)).as("df"))
    // The user-specified hash repartition on doc_id pins BOTH the
    // collect_list aggregation stage AND everything downstream of it
    // wide: AQE coalesces the tiny conf-driven shuffles of this query to
    // a handful of partitions (the candidate equi-join below fans out to
    // Σ cnt² ≈ 42 M intermediate rows at sf0.1 and was running on ~6 of
    // 32 cores), but it leaves user-specified partitioning alone, and
    // groupBy(doc_id) reuses the same clustering with no extra exchange.
    val ordered = sh.join(freq, Seq("shingle"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("toks"))
      .withColumn("n", size(col("toks")))
      // prefix length n − ⌈t·n⌉ + 1 (AllPairs); slice is 1-based
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n")) + 1).cast("int"))
    val pref = ordered
      .select(col("doc_id"), col("n"),
        explode(expr("slice(toks, 1, plen)")).as("tk"))
      .select(col("doc_id"), col("n"), col("tk.shingle").as("shingle"))
      // both sides of the self-join read pref: persist, or the
      // collect_list/sort_array/explode chain above runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = pref.select(col("doc_id").as("a_id"), col("n").as("na"),
      col("shingle"))
    val b = pref.select(col("doc_id").as("b_id"), col("n").as("nb"),
      col("shingle"))
    val cand = a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      // size filter: J ≥ t ⇒ c ≥ t·max and c ≤ min ⇒ min ≥ t·max
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(t) * greatest(col("na"), col("nb")).cast("double"))
      .select("a_id", "b_id").distinct()
      // keep the verification fan-out below wide too (same AQE note)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    // exact verification on candidates only: intersection via equi-join
    // on shingle restricted to candidate pairs, sizes from one groupBy.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1L)).as("sz"))
    val shA = sh.select(col("doc_id").as("a_id"), col("shingle"))
    val shB = sh.select(col("doc_id").as("b_id"), col("shingle"))
    val common = cand
      .join(shA, Seq("a_id"))
      .join(shB, Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1L)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")),
        Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")),
        Seq("b_id"))
      .withColumn("_j", col("common").cast("double") /
        (col("a_sz") + col("b_sz") - col("common")).cast("double"))
      .filter(col("_j") >= t)
      .select(col("a_id"), col("b_id"), col("common"), col("a_sz"),
        col("b_sz"), round(col("_j"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Candidate pairs only (pre-verification) — exposed so the spec can
    * assert the prefix filter actually prunes below all-pairs. */
  def prefixJaccardCandidates(docs: DataFrame, t: Double): DataFrame = {
    val sh = DedupQueries.shingles(docs)
    val freq = sh.groupBy("shingle").agg(count(lit(1L)).as("df"))
    val pref = sh.join(freq, Seq("shingle"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n")) + 1).cast("int"))
      .select(col("doc_id"), col("n"),
        explode(expr("slice(toks, 1, plen)")).as("tk"))
      .select(col("doc_id"), col("n"), col("tk.shingle").as("shingle"))
    pref.select(col("doc_id").as("a_id"), col("n").as("na"), col("shingle"))
      .join(pref.select(col("doc_id").as("b_id"), col("n").as("nb"),
        col("shingle")), Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(t) * greatest(col("na"), col("nb")).cast("double"))
      .select("a_id", "b_id").distinct()
  }

  // ---------------------------------------------------------------------
  // Segment-based edit-distance self-join (PassJoin)
  // ---------------------------------------------------------------------

  /** Shared Spark/DuckDB SQL fragments for the deterministic caption
    * corpus: length-varied prefixes of `documents.text` plus planted
    * 1-delete / 1-substitute / 2-delete variants (ids offset by 1/2/3
    * million) so the join has known-distance pairs at and inside the
    * k = 2 boundary. Both engines evaluate the SAME expressions, so the
    * corpus is bit-identical by construction. */
  val CapExpr = "substr(text, 1, CAST(40 + doc_id % 37 AS INT))"
  val Del1Expr = "substr(cap, 1, 19) || substr(cap, 21)"
  val Sub1Expr = "substr(cap, 1, 4) || 'x' || substr(cap, 6)"
  val Del2Expr = "substr(cap, 1, 9) || substr(cap, 11, 19) || substr(cap, 31)"

  /** (id, cap) corpus: base caps + planted near-duplicate variants. */
  def editCorpus(docs: DataFrame): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .selectExpr("doc_id AS id", s"$CapExpr AS cap")
    val del1 = base.filter(expr("id % 5 = 0"))
      .selectExpr("id + 1000000 AS id", s"$Del1Expr AS cap")
    val sub1 = base.filter(expr("id % 7 = 3"))
      .selectExpr("id + 2000000 AS id", s"$Sub1Expr AS cap")
    val del2 = base.filter(expr("id % 11 = 1"))
      .selectExpr("id + 3000000 AS id", s"$Del2Expr AS cap")
    base.unionAll(del1).unionAll(sub1).unionAll(del2)
  }

  /** DuckDB CTE prefix producing the same `corpus(id, cap)`. */
  def duckEditCorpusCte(table: String): String =
    s"""base AS (SELECT doc_id AS id, $CapExpr AS cap
           FROM $table WHERE text IS NOT NULL),
       del1 AS (SELECT id + 1000000 AS id, $Del1Expr AS cap
                FROM base WHERE id % 5 = 0),
       sub1 AS (SELECT id + 2000000 AS id, $Sub1Expr AS cap
                FROM base WHERE id % 7 = 3),
       del2 AS (SELECT id + 3000000 AS id, $Del2Expr AS cap
                FROM base WHERE id % 11 = 1),
       corpus AS (SELECT * FROM base UNION ALL SELECT * FROM del1
                  UNION ALL SELECT * FROM sub1 UNION ALL SELECT * FROM del2)"""

  /** Segment start position (1-based) for segment `i` of a length-`La`
    * string under the even (k+1)-partition: the last `La mod (k+1)`
    * segments are one char longer. */
  private def posSql(m: Int, La: String, i: String): String =
    s"CAST(($i - 1) * ($La DIV $m) + greatest(0, $i - 1 - ($m - $La % $m)) + 1 AS INT)"

  /** Segment length for segment `i` of a length-`La` string. */
  private def lenSql(m: Int, La: String, i: String): String =
    s"CAST(($La DIV $m) + IF($i > $m - $La % $m, 1, 0) AS INT)"

  /** Exact edit-distance pairs at threshold `k` via PassJoin.
    *
    * Index side: each string of length L emits its k+1 segments keyed
    * (L, seg, substring). Probe side: each string of length L2 emits, for
    * every candidate partner length La ∈ [L2−k, L2+k] and every segment
    * slot, ALL its substrings of that slot's length starting within ±k of
    * the slot's position (a superset of PassJoin's tight shift windows —
    * correct, slightly more candidates). The pigeonhole lemma guarantees
    * every true pair shares such a key, so after `levenshtein ≤ k`
    * verification the result is EXACTLY the all-pairs ground truth.
    *
    * Output: (a_id, b_id, dist), a_id < b_id, ordered. */
  def passJoinEditPairs(corpus: DataFrame, k: Int): DataFrame = {
    val m = k + 1
    val idx = corpus.withColumn("len", length(col("cap")))
      .filter(col("len") >= m)
      .select(col("id"), col("len"),
        explode(expr(
          s"""transform(sequence(1, $m), i -> struct(
                i AS seg,
                substr(cap, ${posSql(m, "len", "i")}, ${lenSql(m, "len", "i")}) AS sub))"""))
          .as("sg"))
      .select(col("id"), col("len"), col("sg.seg").as("seg"),
        col("sg.sub").as("sub"))
    // probe enumeration: ascending-sequence discipline — the window can be
    // empty when La is far longer than len2, so the sequence upper bound is
    // clamped to ≥ lo and overshoot is dropped by filter() (Spark's
    // sequence(a, b) would otherwise DESCEND for b < a).
    val lo = s"""greatest(1, ${posSql(m, "La", "i")} - $k)"""
    val hi = s"""least(len2 - ${lenSql(m, "La", "i")} + 1, ${posSql(m, "La", "i")} + $k)"""
    val probe = corpus.withColumn("len2", length(col("cap")))
      .filter(col("len2") >= 1)
      .select(col("id").as("pid"), col("len2"),
        explode(expr(
          s"""flatten(flatten(
                transform(sequence(greatest(len2 - $k, $m), len2 + $k), La ->
                  transform(sequence(1, $m), i ->
                    transform(
                      filter(sequence($lo, greatest($lo, $hi)), p -> p <= $hi),
                      p -> struct(
                        La AS la, i AS seg,
                        substr(cap, p, ${lenSql(m, "La", "i")}) AS sub))))))"""))
          .as("e"))
      .select(col("pid"), col("e.la").as("la"), col("e.seg").as("seg"),
        col("e.sub").as("sub"))
    val cand = idx.join(probe,
        idx("len") === probe("la") && idx("seg") === probe("seg") &&
          idx("sub") === probe("sub") && idx("id") =!= probe("pid"))
      .select(least(col("id"), col("pid")).as("a_id"),
        greatest(col("id"), col("pid")).as("b_id"))
      .distinct()
    cand
      .join(corpus.select(col("id").as("a_id"), col("cap").as("a_cap")),
        Seq("a_id"))
      .join(corpus.select(col("id").as("b_id"), col("cap").as("b_cap")),
        Seq("b_id"))
      .withColumn("dist", levenshtein(col("a_cap"), col("b_cap")))
      .filter(col("dist") <= k)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy("a_id", "b_id")
  }

  /** Candidate pairs only (pre-verification) — for the pruning spec. */
  def passJoinCandidates(corpus: DataFrame, k: Int): DataFrame = {
    val m = k + 1
    val idx = corpus.withColumn("len", length(col("cap")))
      .filter(col("len") >= m)
      .select(col("id"), col("len"),
        explode(expr(
          s"""transform(sequence(1, $m), i -> struct(
                i AS seg,
                substr(cap, ${posSql(m, "len", "i")}, ${lenSql(m, "len", "i")}) AS sub))"""))
          .as("sg"))
      .select(col("id"), col("len"), col("sg.seg").as("seg"),
        col("sg.sub").as("sub"))
    val lo = s"""greatest(1, ${posSql(m, "La", "i")} - $k)"""
    val hi = s"""least(len2 - ${lenSql(m, "La", "i")} + 1, ${posSql(m, "La", "i")} + $k)"""
    val probe = corpus.withColumn("len2", length(col("cap")))
      .select(col("id").as("pid"), col("len2"),
        explode(expr(
          s"""flatten(flatten(
                transform(sequence(greatest(len2 - $k, $m), len2 + $k), La ->
                  transform(sequence(1, $m), i ->
                    transform(
                      filter(sequence($lo, greatest($lo, $hi)), p -> p <= $hi),
                      p -> struct(
                        La AS la, i AS seg,
                        substr(cap, p, ${lenSql(m, "La", "i")}) AS sub))))))"""))
          .as("e"))
      .select(col("pid"), col("e.la").as("la"), col("e.seg").as("seg"),
        col("e.sub").as("sub"))
    idx.join(probe,
        idx("len") === probe("la") && idx("seg") === probe("seg") &&
          idx("sub") === probe("sub") && idx("id") =!= probe("pid"))
      .select(least(col("id"), col("pid")).as("a_id"),
        greatest(col("id"), col("pid")).as("b_id"))
      .distinct()
  }

  // ---------------------------------------------------------------------
  // Queries + oracles
  // ---------------------------------------------------------------------

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-Jaccard near-dup over the FULL corpus via AllPairs prefix
    // filtering — the scale path the bounded all-pairs rung
    // (q_dedup_jaccard) fences off: the only joins are equi-joins on
    // prefix tokens and on candidate pairs. Oracle = unrestricted
    // all-pairs ground truth; equality IS the correctness claim.
    "q_dedup_jaccard_prefix" -> ((s, dir) =>
      prefixJaccardPairs(docs(s, dir), t = 0.5)),

    // Exact edit-distance ≤ 2 pairs over the caption corpus via PassJoin
    // segment keys — never all-pairs; `levenshtein` (codegen'd builtin)
    // runs on candidates only. Oracle = all-pairs levenshtein ground
    // truth over the identical deterministic corpus.
    "q_dedup_editdist" -> ((s, dir) =>
      passJoinEditPairs(editCorpus(docs(s, dir)), k = 2))
  )

  def oracleSql: Map[String, String] = Map(
    "q_dedup_jaccard_prefix" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS ts FROM documents
           WHERE text IS NOT NULL),
         sh AS (
           SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(range(1, len(ts)-1)) AS u(i)
           WHERE len(ts) >= 3),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         common AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, common, sa.sz AS a_sz, sb.sz AS b_sz,
           round(CAST(common AS DOUBLE)/CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
         FROM common
         JOIN sizes sa ON sa.doc_id = a_id
         JOIN sizes sb ON sb.doc_id = b_id
         WHERE CAST(common AS DOUBLE)/CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.5
         ORDER BY a_id, b_id""",
    "q_dedup_editdist" ->
      s"""WITH ${duckEditCorpusCte("documents")}
         SELECT a.id AS a_id, b.id AS b_id,
           CAST(levenshtein(a.cap, b.cap) AS INT) AS dist
         FROM corpus a JOIN corpus b
           ON a.id < b.id AND abs(length(a.cap) - length(b.cap)) <= 2
         WHERE levenshtein(a.cap, b.cap) <= 2
         ORDER BY a_id, b_id"""
  )
}
