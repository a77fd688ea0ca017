package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the `events` stream table — the
  * event-analytics operator family (assign → per-session stats → ordered
  * funnel). Reference analogues: grouping a biosample's retrieval events
  * into one assessment unit per entity
  * (`/root/reference/src/crawl_first/validation_agent.py:550-597`) and
  * the per-entity event ordering the resume log implies
  * (`cli.py:136-150`).
  *
  * Two rungs compute session boundaries:
  *   - the RELATIONAL rung (`q_sess_assign`): lag over (user, ts), a new
  *     session starts when the gap ≥ `SessionGap`; session index =
  *     running sum of starts — plain windows, DuckDB-replayable;
  *   - the NATIVE rung (`q_sess_stats`): Spark's own `session_window`
  *     grouping. Its DuckDB oracle is the RELATIONAL definition, so the
  *     hash match proves the builtin's merge semantics ≡ the lag-based
  *     spec — the engine-equivalence proof, not just a result dump.
  *
  * Scale notes (10^12 events):
  *   - everything shuffles ONCE on user_id; each window/group is one
  *     user's events (bounded, hash-spread across reducers) — no global
  *     sort anywhere;
  *   - session_window is streaming-native: the same grouping runs over
  *     `readStream` with watermarked state eviction (see
  *     StreamingValidation's ST6 watermark pattern);
  *   - the funnel is conditional aggregation over the assigned frame —
  *     no self-joins, no explosion.
  *
  * Money-ish sums ride integer cents (`value` × 100) so every engine
  * sums exactly; timestamps compare in integer microseconds.
  */
object SessionQueries {

  /** Session gap: a new session starts after ≥ 12 idle hours. */
  val SessionGapSec = 43200L

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Relational session assignment: (event_id, user_id, sess_seq). */
  def assignSessions(d: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    d.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_start",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= SessionGapSec * 1000000L)
          .cast("long"))
      .withColumn("sess_seq", sum(col("is_start")).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_sess_assign" -> ((s, dir) =>
      assignSessions(events(s, dir))
        .select("event_id", "user_id", "sess_seq")
        .orderBy("event_id")),

    // NATIVE rung: Spark's session_window grouping; the oracle recomputes
    // the same rows from the lag-based relational definition, so the hash
    // match proves builtin ≡ spec. Stats are engine-exact: counts,
    // distinct types, integer-cent sums, microsecond duration.
    "q_sess_stats" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), s"$SessionGapSec seconds").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"))
        .withColumn("duration_sec",
          ((col("end_us") - col("start_us")) / 1000000L).cast("long"))
        .select("user_id", "start_us", "end_us", "n_events", "n_types",
          "sum_cents", "duration_sec")
        .orderBy("user_id", "start_us")),

    // Ordered in-session funnel: view → click → purchase by FIRST
    // occurrence time within the session (strict order, same-instant ties
    // don't advance). One row of corpus-level counts.
    "q_sess_funnel" -> ((s, dir) => {
      val assigned = assignSessions(events(s, dir))
      def firstUs(t: String) =
        min(when(col("event_type") === t, unix_micros(col("ts")))).as(s"t_$t")
      assigned.groupBy("user_id", "sess_seq")
        .agg(firstUs("view"), firstUs("click"), firstUs("purchase"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("t_view").isNotNull.cast("long")).as("n_view"),
          sum((col("t_view") < col("t_click")).cast("long")).as("n_view_click"),
          sum((col("t_view") < col("t_click") &&
            col("t_click") < col("t_purchase")).cast("long"))
            .as("n_full_funnel"))
    })
  )

  def oracleSql: Map[String, String] = {
    val gapUs = SessionGapSec * 1000000L
    val assignCte =
      s"""assigned AS (
            SELECT event_id, user_id, ts, event_type, value,
              CAST(sum(CASE WHEN prev_us IS NULL
                  OR epoch_us(ts) - prev_us >= $gapUs THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_seq
            FROM (SELECT *, lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                  FROM events) g)"""
    Map(
      "q_sess_assign" ->
        s"""WITH $assignCte
            SELECT event_id, user_id, sess_seq FROM assigned""",
      "q_sess_stats" ->
        s"""WITH $assignCte
            SELECT user_id,
              CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
              CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
              count(*) AS n_events,
              CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
              CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS BIGINT)
                AS duration_sec
            FROM assigned GROUP BY user_id, sess_seq""",
      "q_sess_funnel" ->
        s"""WITH $assignCte,
            per_sess AS (
              SELECT user_id, sess_seq,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
              FROM assigned GROUP BY 1, 2)
            SELECT count(*) AS n_sessions,
              CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_view,
              CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT)
                AS n_view_click,
              CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
            FROM per_sess"""
    )
  }
}
