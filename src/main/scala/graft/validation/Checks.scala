package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative constraint-suite API — the programmable face of the
  * validation engine (north rule: "schema + constraint validation
  * engine"). A user declares N constraints over a table; the suite
  * compiles ALL of them into ONE aggregation pass, so a 10^12-row scan
  * is paid once no matter how many checks ride it:
  *
  * {{{
  * val suite = CheckSuite(Seq(
  *   Complete("o_custkey", 1.0), Unique(Seq("o_orderkey")),
  *   InRange("o_totalprice", 0, 600000, 1.0), SizeBetween(100, 1e9.toLong)))
  * val verdicts = suite.run(ordersDf)          // (check, metric, pass)
  * val byStatus = suite.run(ordersDf, Seq("o_orderstatus"))
  * }}}
  *
  * Reference semantics: the per-record assessment loop accumulates all
  * its field checks in one traversal of each record batch
  * (`/root/reference/src/crawl_first/validation_agent.py:550-650`) and
  * emits named pass/fail verdict rows with an observed metric
  * (`validation_agent.py:355-364, 753-763`); this API is that contract
  * lifted to a declarative plan the optimizer can fuse.
  *
  * Scale shape (100 TB): every check is an algebraic aggregate —
  * map-side partials collapse each partition to one row of counters, the
  * exchange moves #partitions × one row, the final merge is trivial. The
  * grouped variant shuffles on the group key exactly once (hash
  * aggregate), never once per check. The one non-algebraic member is
  * exact `Unique`/`QuantileBetween`: a single exact-distinct (or exact
  * percentile) is planned as a two-stage aggregate (no row blowup), but
  * each ADDITIONAL exact-distinct column multiplies the scan through an
  * `Expand` node — `ChecksSpec` pins both plans. At 10^12 rows prefer
  * [[ApproxUnique]] (HLL, mergeable, no Expand) and accept the ±2%
  * sketch error, or run exact uniqueness standalone
  * ([[ValidationQueries.uniquenessVerdict]]'s salted two-stage shape).
  *
  * Every check carries its DuckDB aggregate twin (same aliases), and the
  * metric/pass formulas are ONE SQL string parsed by BOTH engines —
  * integer-ratio doubles, so the cross-engine hash compare is exact
  * (`q_v_checksuite`, `q_v_checksuite_grouped`).
  */
sealed trait Check {
  /** Verdict-row label; must be a SQL-identifier-safe literal. */
  def name: String
  /** Resolved label used in verdict rows (defaulted names filled in). */
  def label: String = name
  /** Spark aggregate columns (aliased; aliases shared with [[duckAggs]]). */
  def sparkAggs: Seq[Column]
  /** DuckDB "expr AS alias" fragments — identical aliases. */
  def duckAggs: Seq[String]
  /** Metric over the aliases (+ suite-provided `n` = count(*)); parsed by
    * both engines, so restrict to shared syntax (cast/CASE/arith). */
  def metricSql: String
  /** Pass predicate over the same aliases (unrounded values). */
  def passSql: String
  /** (alias, merge-fn) pairs for combining shard/micro-batch partial
    * counter rows ("sum" | "dsum" (decimal-exact money sum) | "min" |
    * "max"); None marks a check whose stored aggregate cannot be merged
    * from numbers alone (exact/approx distinct, exact quantiles). */
  def partialMerges: Option[Seq[(String, String)]] = None

  protected def a(suffix: String): String =
    name.replaceAll("[^A-Za-z0-9]", "_") + "_" + suffix
}

/** A check that also has a per-row predicate form (row passes ⇔ the
  * predicate holds) — the members [[CheckSuite.annotate]] can turn into
  * per-row violation labels (the reference's per-record assessment
  * output, `validation_agent.py:355-364`). Aggregate-only checks
  * (Unique, MeanBetween, quantiles, SizeBetween) have no row form. */
sealed trait RowCheck extends Check {
  /** Spark row-pass predicate (may be null on null inputs — annotate
    * coalesces to false, i.e. null ⇒ violation). */
  def sparkRowPred: Column
  /** DuckDB SQL twin of the row predicate. */
  def duckRowPredSql: String
}

/** Fraction of non-null values in `column` must be ≥ `minRatio`. */
final case class Complete(column: String, minRatio: Double,
                          override val name: String = "") extends RowCheck {
  private val nm = if (name.nonEmpty) name else s"complete_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_nn"
  def sparkAggs = Seq(count(col(column)).as(al))
  def duckAggs = Seq(s"count($column) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
  def sparkRowPred = col(column).isNotNull
  def duckRowPredSql = s"$column IS NOT NULL"
  override def partialMerges = Some(Seq(al -> "sum"))
}

/** Exact distinct count of the key tuple must equal the row count.
  * Multi-column keys go through a struct on both engines so tuples with
  * null FIELDS still count (single-column nulls are excluded by both
  * engines' `count(DISTINCT)` — standard SQL). */
final case class Unique(columns: Seq[String],
                        override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"unique_${columns.mkString("_")}"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_ndv"
  def sparkAggs =
    if (columns.size == 1) Seq(countDistinct(col(columns.head)).as(al))
    else Seq(countDistinct(struct(columns.map(col): _*)).as(al))
  def duckAggs =
    if (columns.size == 1) Seq(s"count(DISTINCT ${columns.head}) AS $al")
    else Seq(s"count(DISTINCT (${columns.mkString(", ")})) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"$al = n"
}

/** HLL-sketch distinct ratio ≥ `minRatio` — the 10^12-row uniqueness
  * rung: mergeable, algebraic, never plans an Expand. NOT oracle-exact
  * (each engine's sketch differs); spec-verified within `rsd`. */
final case class ApproxUnique(column: String, minRatio: Double,
                              rsd: Double = 0.02,
                              override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"approx_unique_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_andv"
  def sparkAggs = Seq(approx_count_distinct(col(column), rsd).as(al))
  def duckAggs = Seq(s"approx_count_distinct($column) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
}

/** Fraction of rows with `lo ≤ column ≤ hi` must be ≥ `minRatio`. */
final case class InRange(column: String, lo: Double, hi: Double,
                         minRatio: Double,
                         override val name: String = "") extends RowCheck {
  private val nm = if (name.nonEmpty) name else s"range_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_ok"
  private val cond = s"$column >= $lo AND $column <= $hi"
  def sparkAggs = Seq(sum(when(expr(cond), 1L).otherwise(0L)).as(al))
  def duckAggs = Seq(s"sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
  def sparkRowPred = expr(cond)
  def duckRowPredSql = cond
  override def partialMerges = Some(Seq(al -> "sum"))
}

/** Fraction of rows whose `column` is in `values` must be ≥ `minRatio`. */
final case class InSet(column: String, values: Seq[String], minRatio: Double,
                       override val name: String = "") extends RowCheck {
  private val nm = if (name.nonEmpty) name else s"inset_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_in"
  private val lst = values.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
  private val cond = s"$column IN ($lst)"
  def sparkAggs = Seq(sum(when(expr(cond), 1L).otherwise(0L)).as(al))
  def duckAggs = Seq(s"sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
  def sparkRowPred = expr(cond)
  def duckRowPredSql = cond
  override def partialMerges = Some(Seq(al -> "sum"))
}

/** Fraction of rows matching `regex` (unanchored, both engines) ≥
  * `minRatio`. The regex must be valid Java AND RE2-ish DuckDB syntax —
  * stick to character classes/anchors/quantifiers. */
final case class Matches(column: String, regex: String, minRatio: Double,
                         override val name: String = "") extends RowCheck {
  private val nm = if (name.nonEmpty) name else s"matches_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_m"
  def sparkAggs =
    Seq(sum(when(col(column).rlike(regex), 1L).otherwise(0L)).as(al))
  def duckAggs =
    Seq(s"sum(CASE WHEN regexp_matches($column, '${regex.replace("'", "''")}') THEN 1 ELSE 0 END) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
  def sparkRowPred = col(column).rlike(regex)
  def duckRowPredSql =
    s"regexp_matches($column, '${regex.replace("'", "''")}')"
  override def partialMerges = Some(Seq(al -> "sum"))
}

/** Mean of a 2-dp money column within [lo, hi]; the sum rides
  * decimal(18,2) so the cross-engine result is bit-exact (SparkEntry's
  * determinism discipline). */
final case class MeanBetween(column: String, lo: Double, hi: Double,
                             override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"mean_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_sum"
  def sparkAggs =
    Seq(sum(col(column).cast("decimal(18,2)")).cast("double").as(al))
  def duckAggs =
    Seq(s"CAST(sum(CAST($column AS DECIMAL(18,2))) AS DOUBLE) AS $al")
  def metricSql = s"$al / n"
  def passSql = s"$al / n >= $lo AND $al / n <= $hi"
  // each partial is an exact multiple of 0.01 stored as double; the
  // decimal-exact merge recovers the true 2-dp sum (magnitudes < 2^45)
  override def partialMerges = Some(Seq(al -> "dsum"))
}

/** Exact interpolated quantile within [lo, hi] (4-dp rounded in the
  * aggregate — the `q_v_colstats` convention that hash-matches
  * `quantile_cont`). Exact percentile buffers per-group values: fine as
  * the ONE order statistic of a suite; at 10^12 rows use the t-digest
  * drift path ([[Drift]]) for quantile families. */
final case class QuantileBetween(column: String, q: Double, lo: Double,
                                 hi: Double,
                                 override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"p${(q * 100).toInt}_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_q"
  def sparkAggs = Seq(round(expr(s"percentile($column, $q)"), 4).as(al))
  def duckAggs = Seq(s"round(quantile_cont($column, $q), 4) AS $al")
  def metricSql = al
  def passSql = s"$al >= $lo AND $al <= $hi"
}

/** Minimum value must be ≥ `bound` (numeric columns). */
final case class MinGte(column: String, bound: Double,
                        override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"min_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_min"
  def sparkAggs = Seq(min(col(column)).cast("double").as(al))
  def duckAggs = Seq(s"CAST(min($column) AS DOUBLE) AS $al")
  def metricSql = al
  def passSql = s"$al >= $bound"
  override def partialMerges = Some(Seq(al -> "min"))
}

/** Maximum value must be ≤ `bound` (numeric columns). */
final case class MaxLte(column: String, bound: Double,
                        override val name: String = "") extends Check {
  private val nm = if (name.nonEmpty) name else s"max_$column"
  override def label: String = nm
  private val al = nm.replaceAll("[^A-Za-z0-9]", "_") + "_max"
  def sparkAggs = Seq(max(col(column)).cast("double").as(al))
  def duckAggs = Seq(s"CAST(max($column) AS DOUBLE) AS $al")
  def metricSql = al
  def passSql = s"$al <= $bound"
  override def partialMerges = Some(Seq(al -> "max"))
}

/** Row count within [lo, hi] — a partition-emptiness/explosion tripwire. */
final case class SizeBetween(lo: Long, hi: Long,
                             override val name: String = "size") extends Check {
  def sparkAggs = Seq.empty
  def duckAggs = Seq.empty
  def metricSql = "cast(n as double)"
  def passSql = s"n >= $lo AND n <= $hi"
  override def partialMerges = Some(Seq.empty)
}

/** Generic row predicate: fraction of rows satisfying `predicateSql`
  * (ONE string evaluated by both engines — shared syntax only) must be
  * ≥ `minRatio`. The escape hatch for cross-column invariants, e.g.
  * `"l_quantity > 0 OR l_extendedprice = 0"`. */
final case class Satisfies(override val name: String, predicateSql: String,
                           minRatio: Double) extends RowCheck {
  private val al = a("sat")
  def sparkAggs = Seq(sum(when(expr(predicateSql), 1L).otherwise(0L)).as(al))
  def duckAggs = Seq(s"sum(CASE WHEN $predicateSql THEN 1 ELSE 0 END) AS $al")
  def metricSql = s"cast($al as double) / n"
  def passSql = s"cast($al as double) / n >= $minRatio"
  def sparkRowPred = expr(predicateSql)
  def duckRowPredSql = predicateSql
  override def partialMerges = Some(Seq(al -> "sum"))
}

/** A named suite of checks compiled to one aggregation pass. */
final case class CheckSuite(checks: Seq[Check]) {
  require(checks.nonEmpty, "empty check suite")
  require(checks.map(_.label).distinct.size == checks.size,
    s"duplicate check names: ${checks.map(_.label)}")

  private def aggCols: Seq[Column] =
    count(lit(1L)).as("n") +: checks.flatMap(_.sparkAggs)

  private def verdictStructs: Seq[Column] = checks.map { c =>
    struct(
      lit(c.label).as("check"),
      round(expr(c.metricSql).cast("double"), 6).as("metric"),
      coalesce(expr(c.passSql), lit(false)).as("pass"))
  }

  /** Global verdicts: one row per check — (check, metric, pass). One scan,
    * algebraic partials, a single-row exchange. */
  def run(df: DataFrame): DataFrame = run(df, Seq.empty)

  /** Grouped verdicts: one row per (group, check) — the per-partition
    * pass/fail emission of the north rule when `groupCols` is the
    * partition key. One hash-aggregate shuffle total. */
  def run(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg =
      if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val out = agg
      .select(groupCols.map(col) :+
        explode(array(verdictStructs: _*)).as("r"): _*)
      .select(groupCols.map(col) :+ col("r.check") :+ col("r.metric") :+
        col("r.pass"): _*)
    out.orderBy((groupCols :+ "check").map(col): _*)
  }

  /** The suite's row-expressible members, in declaration order. */
  def rowChecks: Seq[RowCheck] = checks.collect { case r: RowCheck => r }

  /** True iff every member's counters merge from stored numbers — the
    * precondition for [[partials]]/[[finalizeFrom]] (streaming or
    * shard-parallel validation). */
  def mergeablePartials: Boolean = checks.forall(_.partialMerges.isDefined)

  /** One partial-counter row for a shard/micro-batch: the suite's
    * aggregate WITHOUT the metric/pass finalize. Rows from many shards
    * merge exactly via [[finalizeFrom]]. */
  def partials(df: DataFrame): DataFrame = {
    require(mergeablePartials,
      s"non-mergeable checks in suite: ${checks.filter(_.partialMerges.isEmpty).map(_.label)}")
    df.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Merge partial-counter rows (any number of shards, any order) and
    * emit the same verdict rows [[run]] would produce over the union of
    * the shards — counts/sums add, money sums re-ride decimal(18,2),
    * mins/maxes combine. Exactly-once semantics come from how partials
    * are STORED (idempotent per shard id), not from this merge. */
  def finalizeFrom(partialRows: DataFrame): DataFrame = {
    require(mergeablePartials,
      s"non-mergeable checks in suite: ${checks.filter(_.partialMerges.isEmpty).map(_.label)}")
    def fn(alias: String, kind: String): Column = (kind match {
      case "sum" => sum(col(alias))
      case "dsum" => sum(col(alias).cast("decimal(18,2)")).cast("double")
      case "min" => min(col(alias))
      case "max" => max(col(alias))
    }).as(alias)
    val merges = ("n" -> "sum") +: checks.flatMap(_.partialMerges.get)
    val cols = merges.map { case (alias, kind) => fn(alias, kind) }
    partialRows.agg(cols.head, cols.tail: _*)
      .select(explode(array(verdictStructs: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.pass"))
      .orderBy("check")
  }

  /** Row-level annotation: appends `violations` (comma-joined labels of
    * the failed row checks, declaration order; both engines' concat_ws
    * skips the NULL arms) and `row_pass`. Pure per-row column math —
    * narrow, codegen'd, no shuffle; the per-record assessment output of
    * the reference (`validation_agent.py:355-364`) as a projection. */
  def annotate(df: DataFrame): DataFrame = {
    val rcs = rowChecks
    require(rcs.nonEmpty, "no row-expressible checks in this suite")
    val marks = rcs.map(c =>
      when(!coalesce(c.sparkRowPred, lit(false)), lit(c.label)))
    df.withColumn("violations", concat_ws(",", marks: _*))
      .withColumn("row_pass", col("violations") === "")
  }

  /** One-pass routing: (clean rows — original schema, quarantined rows —
    * annotated with their violations). Both frames derive from the same
    * annotated projection, so writing clean + quarantine sinks costs one
    * scan each with only a codegen'd filter on top (or ONE scan total via
    * `partitionBy(row_pass)` on the annotated frame). */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val ann = annotate(df)
    (ann.filter(col("row_pass")).drop("violations", "row_pass"),
      ann.filter(!col("row_pass")).drop("row_pass"))
  }

  /** DuckDB twin of the quarantine side of [[split]] (key columns +
    * violations, failing rows only) — generated from the same row
    * predicates. */
  def duckQuarantineSql(table: String, keyCols: Seq[String]): String = {
    val rcs = rowChecks
    val arms = rcs.map(c =>
      s"CASE WHEN NOT coalesce(${c.duckRowPredSql}, false) THEN '${c.label}' END")
      .mkString(",\n           ")
    val anyFail = rcs.map(c => s"NOT coalesce(${c.duckRowPredSql}, false)")
      .mkString("\n            OR ")
    s"""SELECT ${keyCols.mkString(", ")},
         concat_ws(',',
           $arms) AS violations
       FROM $table
       WHERE $anyFail
       ORDER BY ${keyCols.mkString(", ")}"""
  }

  /** The DuckDB twin of [[run]] over `table` — generated from the SAME
    * check definitions, so the oracle can never drift from the plan.
    * `where` restricts the scanned slice (shared-syntax predicate). */
  def duckSql(table: String, groupCols: Seq[String] = Seq.empty,
              where: String = ""): String = {
    val gsel = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ", "
    val gby = if (groupCols.isEmpty) "" else " GROUP BY " + groupCols.mkString(", ")
    val wh = if (where.isEmpty) "" else s" WHERE $where"
    val frags = ("count(*) AS n" +: checks.flatMap(_.duckAggs)).mkString(",\n    ")
    val arms = checks.map { c =>
      s"""SELECT $gsel'${c.label}' AS "check",
         round(CAST(${c.metricSql} AS DOUBLE), 6) AS metric,
         coalesce(${c.passSql}, false) AS pass FROM a"""
    }.mkString("\n  UNION ALL\n  ")
    val order = (groupCols :+ "\"check\"").mkString(", ")
    s"""WITH a AS (SELECT $gsel$frags FROM $table$wh$gby)
       $arms
       ORDER BY $order"""
  }
}

/** Run-over-run metric anomaly detection — the metric-level sibling of
  * the distribution-level [[Drift]] checks (reference: drift vs
  * peers/priors, `validation_agent.py:85-109, 258-305`). A metric is
  * anomalous when it moved more than `maxAbsDelta + maxRelDelta·|base|`
  * from the baseline run — the additive term absorbs noise near zero,
  * the relative term scales with the metric. */
object MetricAnomaly {

  /** Join two verdict frames of the SAME suite on check name and flag
    * movements. Output: (check, base_metric, metric, delta, anomalous).
    * All inputs are 6-dp verdict metrics, so the deltas are identical FP
    * ops in any engine. */
  def vs(cur: DataFrame, baseline: DataFrame, maxAbsDelta: Double,
         maxRelDelta: Double): DataFrame = {
    val b = baseline.select(col("check"), col("metric").as("base_metric"))
    cur.select(col("check"), col("metric"))
      .join(b, Seq("check"))
      .withColumn("delta", round(col("metric") - col("base_metric"), 6))
      .withColumn("anomalous",
        abs(col("metric") - col("base_metric")) >
          lit(maxAbsDelta) + lit(maxRelDelta) * abs(col("base_metric")))
      .select(col("check"), col("base_metric"), col("metric"),
        col("delta"), col("anomalous"))
      .orderBy("check")
  }

  /** DuckDB twin: two generated suite aggregates (current slice vs
    * baseline slice of `table`) joined with the same delta math. */
  def duckSql(suite: CheckSuite, table: String, baselineWhere: String,
              maxAbsDelta: Double, maxRelDelta: Double): String =
    s"""WITH cur AS (${suite.duckSql(table)}),
       base AS (${suite.duckSql(table, where = baselineWhere)})
       SELECT cur."check", base.metric AS base_metric, cur.metric,
         round(cur.metric - base.metric, 6) AS delta,
         abs(cur.metric - base.metric) >
           $maxAbsDelta + $maxRelDelta * abs(base.metric) AS anomalous
       FROM cur JOIN base ON cur."check" = base."check"
       ORDER BY cur."check""""
}

/** Persisted per-run verdict history — the metrics repository the
  * anomaly checks read. One `part=<run_id>` partition per run, written
  * with the side-store discipline (dynamic partition overwrite ⇒ a
  * re-recorded run replaces itself; a 10^6-run history prunes to the two
  * partitions a comparison reads). */
object MetricsRepository {

  def record(verdicts: DataFrame, runId: String, dir: String): Unit =
    PartitionedStore.write(verdicts.withColumn("part", lit(runId)), dir)

  /** Full history: (run_id, check, metric, pass). */
  def history(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).withColumnRenamed("part", "run_id")

  /** Anomalies of `runId` vs `baselineId` straight from the store. */
  def anomalies(spark: org.apache.spark.sql.SparkSession, dir: String,
                runId: String, baselineId: String, maxAbsDelta: Double,
                maxRelDelta: Double): DataFrame = {
    val h = history(spark, dir)
    MetricAnomaly.vs(
      h.filter(col("run_id") === runId),
      h.filter(col("run_id") === baselineId),
      maxAbsDelta, maxRelDelta)
  }
}

object CheckSuite {

  /** Schema assertion report: verdict rows for expected (column, type)
    * pairs, computed from `df.schema` — metadata only, no scan. The
    * "schema" half of "schema + constraint validation engine"; typed
    * like the data verdicts so callers can union the two. */
  def schemaReport(df: DataFrame,
                   expected: Seq[(String, String)]): DataFrame = {
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows = expected.map { case (cname, tpe) =>
      val present = actual.contains(cname)
      val actualTpe = actual.getOrElse(cname, "")
      (cname, tpe, actualTpe, present, present && actualTpe == tpe)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "expected_type", "actual_type", "present", "pass")
  }
}
