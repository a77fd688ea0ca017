package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the curation primitive for
  * rebalancing a corpus (down-weight boilerplate strata, keep rare
  * ones whole) without any RNG state: membership is a pure function of
  * the row's id, so a resumed or re-run job draws the SAME sample
  * (reference's reproducibility philosophy, `philosophy.md:7-23`; the
  * id-hash sample gate is `cli.py:21-31`'s random-sample option made
  * deterministic).
  *
  * Two shapes:
  *   - [[stratified]] — per-stratum RATE as k/256: keep iff the first
  *     two hex chars of md5(id) sort below the threshold byte. A pure
  *     scan-stage predicate: zero shuffle, survives pushdown, and both
  *     engines compare the same hex strings bit-identically.
  *   - [[stratifiedExactK]] — per-stratum exact COUNT: rank by
  *     (md5(id), id) within the stratum, keep the first k. One shuffle
  *     on the stratum key; a pathologically hot stratum bounds at one
  *     reducer's sort of its rows — at 10^12 rows pre-thin with
  *     [[stratified]] at ~4k/|stratum| first so the window sorts only
  *     ~4k candidates per stratum (documented two-phase shape).
  */
object Sampling {

  /** Hash bucket in [00,ff]: first two hex chars of md5(id). */
  private def bucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)

  /** Keep each row of stratum s with probability rates256(s)/256;
    * strata absent from the map are dropped (rate 0). */
  def stratified(df: DataFrame, stratum: String, id: Column,
                 rates256: Map[String, Int]): DataFrame = {
    require(rates256.values.forall(r => r >= 0 && r <= 256), "rate in [0,256]")
    val thr = rates256.foldLeft(lit("00")) { case (acc, (s, r)) =>
      when(col(stratum) === s, lit(f"$r%02x")).otherwise(acc)
    }
    df.filter(bucket(id) < thr)
  }

  /** Exactly min(k, |stratum|) rows per stratum, chosen by hash rank —
    * the deterministic twin of per-group reservoir sampling. */
  def stratifiedExactK(df: DataFrame, stratum: String, id: Column,
                       k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum)).orderBy(bucket(id), md5(id.cast("string")), id)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** WEIGHTED sample without replacement, deterministic (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006,
    * algorithm A-ES): each row gets key u^(1/w) with u uniform and w its
    * weight; the k largest keys are a weighted sample without
    * replacement. Here u derives from md5(id) — the engine's pure-
    * function-of-the-row RNG discipline — so a re-run or a resumed job
    * draws the SAME sample, and the DuckDB twin reproduces it from the
    * same hex. Selection uses the log-monotone key ln(u)/w (descending;
    * ln u < 0, so heavier w pulls the key toward 0): same order, no
    * tiny-exponent underflow at extreme weights.
    *
    * The curation use: quality-weighted corpus thinning — sample
    * documents proportional to a quality/length weight instead of
    * uniformly, still reproducibly.
    *
    * Scale shape: one narrow projection computes keys; global top-k is
    * TakeOrderedAndProject (per-partition k-heaps, driver merges P·k
    * candidates) — no global sort, no full shuffle. Keys are exported
    * at round-6; ordering uses the raw double (u is a 32-bit grid, so
    * cross-engine ties are exact-id-resolved, not float-resolved).
    *
    * Rows with null/non-positive weights are excluded (a zero weight
    * can never be sampled; negative weights are a caller bug surfaced
    * by exclusion, not NaN keys). */
  def weightedTopK(df: DataFrame, id: Column, weightSql: String,
                   k: Int): DataFrame = {
    val w = expr(weightSql).cast("double")
    // u in (0,1] on a 2^32 grid from the first 8 hex chars of md5(id)
    val v = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (v.cast("double") + 1.0) / 4294967296.0
    df.filter(w.isNotNull && w > 0.0)
      .withColumn("_u", u)
      .withColumn("_key", log(col("_u")) / w)
      .withColumn("sample_key", round(col("_key"), 6))
      .orderBy(col("_key").desc, id.asc)
      .limit(k)
  }

  /** DuckDB expression for the same u: first 8 hex chars of md5(idSql)
    * parsed onto the identical 2^32 grid. */
  def duckUSql(idSql: String): String =
    s"(CAST(('0x' || substr(md5(CAST(($idSql) AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0"
}
