package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-large INTERVAL OVERLAP JOIN — the partitioned temporal join
  * (Enderle/Hampel/Seidl, "Joining interval data in relational
  * databases", SIGMOD 2004 bucket family; the shape Spark is missing
  * natively: `q_j5_range_tiers` covers range joins where one side fits
  * in a broadcast, but two 100 TB interval tables joined on
  * `a.from < b.to AND b.from < a.to` degenerate into a per-key
  * nested-loop unless candidates come from an equi-join). Reference
  * analogue: study-period × publication-window matching in crawl-first's
  * temporal stitching (`/root/reference/src/crawl_first/analysis.py:
  * 1207-1210` date-window reconciliation), lifted to a symmetric join.
  *
  * Production shape: explode each interval into the fixed-width EPOCH
  * BUCKETS it touches (`sequence(from div W, to div W)` — linear in
  * interval length / W, independent of corpus size), equi-join on
  * (key, bucket), then apply the exact overlap predicate. A pair that
  * shares several buckets would duplicate, so each pair is emitted ONLY
  * at the bucket containing `greatest(a_from, b_from)` — the first
  * bucket both intervals occupy — which makes the output exactly-once
  * WITHOUT a distinct (no dedup shuffle; the classic emit-at-start
  * trick). Plan: two narrow explodes + ONE equi-join on (key, bucket) +
  * a codegen'd filter — no theta join, no cartesian anywhere.
  *
  * Bucket width trades explode fan-out (long intervals / small W) vs
  * candidate selectivity (short intervals / large W); here W = 1024 s
  * against intervals ≤ 660 s, so each interval lands in ≤ 2 buckets.
  * At 10^12 rows the same plan holds with W sized to the interval-length
  * p99 (the zone-map stats layer already measures it); skew on a hot
  * (key, bucket) is AQE-split like any other equi-join.
  *
  * All bound arithmetic is BIGINT epoch-microseconds; bucket ids use
  * integer `div` (never double division — a 2^53 mantissa cannot be
  * trusted to floor exact multiples of W correctly).
  */
object IntervalJoin {

  /** Bucket width: 1024 s in µs. */
  val BucketUs: Long = 1024L * 1000000L

  /** Shared-syntax side derivations: events split by event_id parity
    * into two interval tables per user timeline, durations keyed off
    * event_id (same deterministic rule as `q_v_intervals`, so both
    * engines build bit-identical inputs). */
  val FromSql = "unix_micros(CAST(ts AS TIMESTAMP))"
  val ToSql =
    "unix_micros(CAST(ts AS TIMESTAMP)) + (60 + event_id % 600) * 1000000"
  val DuckFromSql = "epoch_us(ts)"
  val DuckToSql = "epoch_us(ts) + (60 + event_id % 600) * 1000000"

  private def side(events: DataFrame, parity: Int, pfx: String): DataFrame =
    events.filter(expr(s"event_id % 2 = $parity"))
      .select(col("user_id").as("k"),
        col("event_id").as(s"${pfx}_id"),
        expr(FromSql).as(s"${pfx}_from_us"),
        expr(ToSql).as(s"${pfx}_to_us"))

  /** Explode one side into the (key, bucket) grid it touches. */
  private def bucketed(df: DataFrame, pfx: String): DataFrame =
    df.withColumn("bucket",
      explode(sequence(
        expr(s"${pfx}_from_us div $BucketUs"),
        expr(s"${pfx}_to_us div $BucketUs"))))

  /** Overlapping (a, b) interval pairs per user: strict overlap on
    * half-open [from, to) bounds, each pair exactly once, with the
    * overlap amount and an Allen-style relation label. Output
    * (k, a_id, b_id, a_from_us, a_to_us, b_from_us, b_to_us,
    * overlap_us, rel), ordered. */
  def overlapJoin(events: DataFrame): DataFrame = {
    val a = bucketed(side(events, 0, "a"), "a")
    val b = bucketed(side(events, 1, "b"), "b")
    a.join(b, Seq("k", "bucket"))
      .filter(col("a_from_us") < col("b_to_us") &&
        col("b_from_us") < col("a_to_us"))
      // exactly-once: only the bucket holding the later of the starts
      .filter(col("bucket") ===
        expr(s"greatest(a_from_us, b_from_us) div $BucketUs"))
      .withColumn("overlap_us",
        least(col("a_to_us"), col("b_to_us")) -
          greatest(col("a_from_us"), col("b_from_us")))
      .withColumn("rel",
        when(col("a_from_us") <= col("b_from_us") &&
          col("b_to_us") <= col("a_to_us"), "a_contains_b")
          .when(col("b_from_us") <= col("a_from_us") &&
            col("a_to_us") <= col("b_to_us"), "b_contains_a")
          .otherwise("overlaps"))
      .select("k", "a_id", "b_id", "a_from_us", "a_to_us",
        "b_from_us", "b_to_us", "overlap_us", "rel")
      .orderBy("k", "a_id", "b_id")
  }

  /** Per-key rollup — the aggregate a timeline-reconciliation report
    * reads: pair count, total/max overlap, relation mix. */
  def overlapStats(events: DataFrame): DataFrame =
    overlapJoin(events)
      .groupBy("k").agg(
        count(lit(1L)).as("n_pairs"),
        sum(col("overlap_us")).as("total_overlap_us"),
        max(col("overlap_us")).as("max_overlap_us"),
        sum(when(col("rel") === "a_contains_b", 1L).otherwise(0L))
          .as("n_a_contains_b"),
        sum(when(col("rel") === "b_contains_a", 1L).otherwise(0L))
          .as("n_b_contains_a"))
      .withColumnRenamed("k", "key")
      .orderBy("key")

  // ---------------------------------------------------------------------

  private def duckSides: String =
    s"""a AS (SELECT user_id AS k, event_id AS a_id,
           $DuckFromSql AS a_from_us, $DuckToSql AS a_to_us
         FROM events WHERE event_id % 2 = 0),
       b AS (SELECT user_id AS k, event_id AS b_id,
           $DuckFromSql AS b_from_us, $DuckToSql AS b_to_us
         FROM events WHERE event_id % 2 = 1),
       pairs AS (
         SELECT a.k, a_id, b_id, a_from_us, a_to_us, b_from_us, b_to_us,
           least(a_to_us, b_to_us) - greatest(a_from_us, b_from_us)
             AS overlap_us,
           CASE WHEN a_from_us <= b_from_us AND b_to_us <= a_to_us
                  THEN 'a_contains_b'
                WHEN b_from_us <= a_from_us AND a_to_us <= b_to_us
                  THEN 'b_contains_a'
                ELSE 'overlaps' END AS rel
         FROM a JOIN b ON a.k = b.k
           AND a_from_us < b_to_us AND b_from_us < a_to_us)"""

  /** The DuckDB oracle is the DIRECT range join (ground truth by
    * definition); the Spark side must reproduce it exactly through the
    * bucket grid — dedup discipline and boundary strictness included. */
  def oracleSql: Map[String, String] = Map(
    "q_j11_interval_join" ->
      s"""WITH $duckSides
         SELECT * FROM pairs ORDER BY k, a_id, b_id""",
    "q_j11_interval_stats" ->
      s"""WITH $duckSides
         SELECT k AS key, count(*) AS n_pairs,
           CAST(sum(overlap_us) AS BIGINT) AS total_overlap_us,
           max(overlap_us) AS max_overlap_us,
           CAST(sum(CASE WHEN rel = 'a_contains_b' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_a_contains_b,
           CAST(sum(CASE WHEN rel = 'b_contains_a' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_b_contains_a
         FROM pairs GROUP BY k
         ORDER BY key""")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bucketed equi-join interval overlap pairs — the large-large
    // temporal join J5's broadcast NLJ can't do; exactly-once via
    // emit-at-later-start, verified against DuckDB's direct range join.
    "q_j11_interval_join" -> ((s, dir) =>
      overlapJoin(Tables(s, dir, "events"))),
    // Per-timeline rollup of the same pairs.
    "q_j11_interval_stats" -> ((s, dir) =>
      overlapStats(Tables(s, dir, "events"))))
}
