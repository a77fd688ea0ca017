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
}
