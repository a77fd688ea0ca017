package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-relationship analyzers that complete the profiling surface:
  * mutual information (how strongly two categorical columns co-vary),
  * order invariants (is a per-key sequence sorted the way the schema
  * promises), and relationship cardinality (is an FK edge 1:1, N:1 or
  * N:M). Together with [[Profiler]] (per-column stats), the drift
  * scores and the dependency-discovery trio (Inclusion/FunctionalDeps/
  * UniqueCombos) these are the analyzer set of published data-quality
  * suites, re-derived as single-pass Catalyst aggregations.
  *
  * Reference semantics: the cross-field consistency judgments the
  * validation agent makes per record (`/root/reference/src/crawl_first/
  * validation_agent.py:355-364` — field A constrains field B), lifted
  * to corpus-level scores.
  *
  * Determinism discipline (cross-engine hash contract): every count is
  * an exact integer; `ln` is the only transcendental and final values
  * ride round(…,6), the same ladder as entropy/PSI.
  */
object Analyzers {

  /** Mutual information between two categorical columns via the
    * entropy composition MI = H(x) + H(y) − H(x,y), in nats.
    *
    * Scale shape (100 TB): ONE corpus scan — the joint (x,y) counts
    * are a single hash-aggregate shuffle (map-side partials), then
    * `localCheckpoint` pins the ≤ ndv_x·ndv_y-row frame so both
    * marginals and all three entropies derive from it without
    * re-reading the source. Categorical columns by contract: the
    * joint frame must stay small (the caller picks columns the
    * profiler proved low-NDV).
    *
    * Output (one row): n, ndv_x, ndv_y, ndv_xy, h_x, h_y, h_xy, mi,
    * mi_norm — where mi_norm = MI/min(H(x),H(y)) ∈ [0,1] is the
    * scale-free form whose thresholds survive corpus growth (1.0 ⇔
    * one column determines the other, 0.0 ⇔ independent).
    */
  def mutualInfo(df: DataFrame, x: String, y: String): DataFrame = {
    val joint = df
      .groupBy(col(x).as("x"), col(y).as("y"))
      .agg(count(lit(1L)).as("c"))
      .localCheckpoint() // tiny: one row per observed (x, y) pair
    def lnSum(cnt: Column) = sum(cnt.cast("double") * log(cnt.cast("double")))
    val sj = joint.agg(sum("c").as("n"), count(lit(1L)).as("ndv_xy"),
      lnSum(col("c")).as("sj"))
    val sx = joint.groupBy("x").agg(sum("c").as("cx"))
      .agg(count(lit(1L)).as("ndv_x"), lnSum(col("cx")).as("sx"))
    val sy = joint.groupBy("y").agg(sum("c").as("cy"))
      .agg(count(lit(1L)).as("ndv_y"), lnSum(col("cy")).as("sy"))
    val n = col("n").cast("double")
    val hx = log(n) - col("sx") / n
    val hy = log(n) - col("sy") / n
    val hxy = log(n) - col("sj") / n
    sj.crossJoin(sx).crossJoin(sy).select(
      col("n"), col("ndv_x"), col("ndv_y"), col("ndv_xy"),
      round(hx, 6).as("h_x"), round(hy, 6).as("h_y"),
      round(hxy, 6).as("h_xy"),
      round(hx + hy - hxy, 6).as("mi"),
      round((hx + hy - hxy) / least(hx, hy), 6).as("mi_norm"))
  }

  /** Order invariant (sequence-validity check): per `key`, `value`
    * must be non-decreasing when rows are ordered by `ord` — e.g. the
    * write-order vs event-time inversion audit. `ord` must be unique
    * within a key so the order is total and every engine sees the
    * same neighbor pairs.
    *
    * Scale shape: one shuffle on `key` (the window partitioning),
    * bounded per-key window state, then a global single-row aggregate.
    * Inversion counting is integer-exact — no rounding anywhere — and
    * the verdict row is emitted even when the corpus is clean (V9).
    *
    * Output (one row): n_keys, n_pairs, n_inversions, pass.
    */
  def orderInvariant(df: DataFrame, key: String, ord: String,
                     value: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
    df.select(col(key), col(ord), col(value))
      .withColumn("prev_v", lag(value, 1).over(w))
      .agg(
        countDistinct(col(key)).as("n_keys"),
        count(col("prev_v")).as("n_pairs"),
        sum(when(col("prev_v") > col(value), 1L).otherwise(0L))
          .as("n_inversions"))
      .select(col("n_keys"), col("n_pairs"), col("n_inversions"),
        (col("n_inversions") === 0).as("pass"))
  }

  /** Relationship cardinality for one FK edge: the max key
    * multiplicity on each side classifies the edge 1:1 / N:1 / N:M —
    * the cardinality typing that turns inclusion-dependency facts
    * (directionless containment) into a usable schema graph.
    *
    * Scale shape: two single-column hash aggregates (map-side
    * partials, one exchange each), each reduced to ONE row before the
    * crossJoin — integer-exact throughout.
    */
  def relationshipCardinality(rel: String,
                              child: DataFrame, childKey: String,
                              parent: DataFrame, parentKey: String): DataFrame = {
    val cg = child.groupBy(col(childKey)).agg(count(lit(1L)).as("c"))
      .agg(count(lit(1L)).as("ndv_child"), sum("c").as("n_child"),
        max("c").as("max_child_mult"))
    val pg = parent.groupBy(col(parentKey)).agg(count(lit(1L)).as("c"))
      .agg(count(lit(1L)).as("ndv_parent"), sum("c").as("n_parent"),
        max("c").as("max_parent_mult"))
    cg.crossJoin(pg).select(
      lit(rel).as("rel"),
      col("n_child"), col("ndv_child"), col("max_child_mult"),
      col("n_parent"), col("ndv_parent"), col("max_parent_mult"),
      when(col("max_parent_mult") > 1, "N:M")
        .when(col("max_child_mult") > 1, "N:1")
        .otherwise("1:1").as("cardinality"))
  }

  /** Vector-column sanity — the validation surface for the embedding
    * modality (the `embeddings` table is the ANN/semantic-dedup
    * substrate; a single NaN or ragged vector silently poisons every
    * cosine downstream): dimension uniformity, null vectors, non-finite
    * components, zero vectors, and the L2-norm envelope (a unit-norm
    * corpus drifting off 1.0 means an unnormalized ingest batch).
    *
    * All per-vector math is a left-fold in array order with every
    * component cast to double BEFORE multiplying, so Spark's
    * `aggregate` HOF and DuckDB's `list_sum(list_transform(...))`
    * produce bit-identical sums (same addition order, same widening).
    *
    * Scale shape: one narrow codegen'd projection + one single-row
    * aggregation — no shuffle wider than the final scalar partials.
    *
    * Output: one row (n, n_null, dims_min, dims_max, n_nonfinite,
    * n_zero, norm_min, norm_max, norm_avg, pass). */
  def embeddingSanity(df: DataFrame, vecCol: String,
                      normLo: Double, normHi: Double): DataFrame = {
    val v = col(vecCol)
    val sq = expr(s"aggregate($vecCol, cast(0 as double), " +
      "(a, x) -> a + cast(x as double) * cast(x as double))")
    val nBad = expr(s"size(filter($vecCol, x -> isnan(cast(x as double)) " +
      "OR abs(cast(x as double)) = cast('Infinity' as double)))")
    val per = df.select(
      when(v.isNull, 1L).otherwise(0L).as("is_null"),
      when(v.isNotNull, size(v)).as("dims"),
      when(v.isNotNull, nBad).as("n_bad"),
      when(v.isNotNull && nBad === 0, sqrt(sq)).as("norm"))
    per.agg(
      count(lit(1L)).as("n"),
      sum(col("is_null")).as("n_null"),
      min(col("dims")).as("dims_min"),
      max(col("dims")).as("dims_max"),
      sum(when(col("n_bad") > 0, 1L).otherwise(0L)).as("n_nonfinite"),
      sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
      round(min(col("norm")), 6).as("norm_min"),
      round(max(col("norm")), 6).as("norm_max"),
      round(avg(col("norm")), 6).as("norm_avg"))
      .withColumn("pass",
        col("n_null") === 0L && col("dims_min") === col("dims_max") &&
          col("n_nonfinite") === 0L && col("n_zero") === 0L &&
          col("norm_min") >= normLo && col("norm_max") <= normHi)
  }

  /** DuckDB twin of [[embeddingSanity]] — same fold order, same
    * widening, same envelope literals. */
  def duckEmbeddingSanitySql(table: String, vecCol: String,
                             normLo: Double, normHi: Double): String =
    s"""WITH per AS (
         SELECT CASE WHEN $vecCol IS NULL THEN 1 ELSE 0 END AS is_null,
           CASE WHEN $vecCol IS NOT NULL THEN len($vecCol) END AS dims,
           CASE WHEN $vecCol IS NOT NULL THEN
             len(list_filter($vecCol, x -> isnan(CAST(x AS DOUBLE))
               OR NOT isfinite(CAST(x AS DOUBLE)))) END AS n_bad,
           CASE WHEN $vecCol IS NOT NULL
                 AND len(list_filter($vecCol, x -> isnan(CAST(x AS DOUBLE))
                   OR NOT isfinite(CAST(x AS DOUBLE)))) = 0 THEN
             sqrt(list_sum(list_transform($vecCol,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END AS norm
         FROM $table),
       a AS (SELECT count(*) AS n,
           CAST(sum(is_null) AS BIGINT) AS n_null,
           CAST(min(dims) AS INT) AS dims_min,
           CAST(max(dims) AS INT) AS dims_max,
           CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           round(min(norm), 6) AS norm_min,
           round(max(norm), 6) AS norm_max,
           round(avg(norm), 6) AS norm_avg
         FROM per)
       SELECT *, (n_null = 0 AND dims_min = dims_max AND n_nonfinite = 0
         AND n_zero = 0 AND norm_min >= $normLo AND norm_max <= $normHi)
         AS pass
       FROM a"""
}
