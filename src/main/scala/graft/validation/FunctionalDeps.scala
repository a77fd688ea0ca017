package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Functional-dependency discovery — the SINGLE-TABLE face of the
  * dependency profiler (the cross-table face is [[Inclusion]]): which
  * columns determine which (det → dep holds iff every distinct det
  * value maps to exactly one dep value). This is what surfaces
  * candidate keys and denormalized-copy columns before anyone declares
  * a constraint; the published lineage is TANE (Huhtala et al., 1999)
  * partition refinement — re-derived here as the distributed
  * aggregation shape: det → dep holds iff
  * `max over det-groups of countDistinct(dep) == 1`.
  *
  * Reference semantics: the asserted-vs-derived consistency checks
  * (`/root/reference/src/crawl_first/validation_agent.py:258-305`)
  * assume they know which fields must agree; this operator DISCOVERS
  * the agreement structure from the data.
  *
  * Scale shape (100 TB): one hash-aggregate pass PER DETERMINANT (k
  * passes for k columns), each shuffling only the k-column projection
  * on the determinant — never a pairwise self-join, never a value
  * cross-join. Multiple exact countDistinct in one pass plan an
  * Expand ×(k−1) (documented, the oracle rung); at 10^12 rows swap
  * them for approx_count_distinct (no Expand, mergeable HLL) to prune
  * candidates and re-verify only the survivors exactly — max(ndv)=1
  * survives approximation because HLL is exact at cardinality 1.
  * Nulls are a VALUE for FD purposes (SQL-standard FDs ignore null
  * rows; profilers want `null` to break agreement like any other
  * mismatch), so every column rides as a string with a null sentinel —
  * bit-stable across engines.
  */
object FunctionalDeps {

  /** Null sentinel — a value-plane character no generator emits. */
  val NullMark = "␀"

  /** FD sweep over `cols` of `df`: one row per ordered pair
    * (det, dep, det_ndv, max_dep_ndv, holds); holds ⇔ max_dep_ndv = 1.
    */
  def fds(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val proj = df.select(cols.map(c =>
      coalesce(col(c).cast("string"), lit(NullMark)).as(c)): _*)
    val arms = cols.map { det =>
      val deps = cols.filterNot(_ == det)
      val perGroup = proj.groupBy(col(det))
        .agg(countDistinct(col(deps.head)).as(deps.head),
          deps.tail.map(d => countDistinct(col(d)).as(d)): _*)
      val maxed = perGroup.agg(count(lit(1L)).as("det_ndv"),
        deps.map(d => max(col(d)).as(d)): _*)
      val rows: Seq[Column] = deps.map(d => struct(
        lit(det).as("det"), lit(d).as("dep"),
        col("det_ndv").as("det_ndv"), col(d).as("max_dep_ndv"),
        (col(d) === 1L).as("holds")))
      maxed.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
    }
    arms.reduce(_.unionAll(_)).orderBy("det", "dep")
  }

  /** Conditional-FD pattern tableau for det → dep (Fan et al.,
    * "Conditional Functional Dependencies for Data Cleaning", ICDE 2007,
    * re-derived as one aggregation shape): a plain FD that fails globally
    * often HOLDS on identifiable det-value patterns — the tableau rows.
    * For each det value with support ≥ `minSupport`: its dep-NDV, the
    * dominant dep value (ties broken by value, deterministically), and
    * the confidence = dominant share; `exact` ⇔ single dep value,
    * `holds` ⇔ confidence ≥ `minConf`.
    *
    * Scale shape: one groupBy on (det, dep) — joint-NDV-sized output —
    * then a groupBy on det over that; rows never cross a second shuffle.
    * Nulls are values (profiler semantics), same sentinel as [[fds]].
    */
  def cfd(df: DataFrame, det: String, dep: String,
          minSupport: Long, minConf: Double): DataFrame = {
    val proj = df.select(
      coalesce(col(det).cast("string"), lit(NullMark)).as("det_value"),
      coalesce(col(dep).cast("string"), lit(NullMark)).as("dep_value"))
    val joint = proj.groupBy("det_value", "dep_value")
      .agg(count(lit(1L)).as("cnt"))
    joint.groupBy("det_value")
      .agg(sum("cnt").as("support"),
        count(lit(1L)).as("ndv_dep"),
        max(struct(col("cnt"), col("dep_value"))).as("top"))
      .filter(col("support") >= minSupport)
      .select(col("det_value"), col("support"), col("ndv_dep"),
        col("top.dep_value").as("top_dep"),
        round(col("top.cnt").cast("double") /
          col("support").cast("double"), 6).as("confidence"))
      .withColumn("exact", col("ndv_dep") === 1L)
      .withColumn("holds", col("confidence") >= minConf)
      .orderBy("det_value")
  }

  /** DuckDB twin of [[cfd]]: the struct-max dominant pick is restated as
    * rn=1 over (cnt DESC, dep_value DESC) — the identical total order. */
  def duckCfdSql(table: String, det: String, dep: String,
                 minSupport: Long, minConf: Double): String =
    s"""WITH p AS (
         SELECT coalesce(CAST($det AS VARCHAR), '$NullMark') AS det_value,
           coalesce(CAST($dep AS VARCHAR), '$NullMark') AS dep_value
         FROM $table),
       joint AS (SELECT det_value, dep_value, count(*) AS cnt
                 FROM p GROUP BY 1, 2),
       ranked AS (SELECT det_value, dep_value, cnt,
           sum(cnt) OVER (PARTITION BY det_value) AS support,
           count(*) OVER (PARTITION BY det_value) AS ndv_dep,
           row_number() OVER (PARTITION BY det_value
             ORDER BY cnt DESC, dep_value DESC) AS rn
         FROM joint)
       SELECT det_value, CAST(support AS BIGINT) AS support,
         CAST(ndv_dep AS BIGINT) AS ndv_dep, dep_value AS top_dep,
         round(CAST(cnt AS DOUBLE) / CAST(support AS DOUBLE), 6) AS confidence,
         ndv_dep = 1 AS exact,
         round(CAST(cnt AS DOUBLE) / CAST(support AS DOUBLE), 6) >= $minConf AS holds
       FROM ranked WHERE rn = 1 AND support >= $minSupport
       ORDER BY det_value"""

  /** DuckDB twin over the same static column list — generated from one
    * definition so the formula cannot drift. */
  def duckSql(table: String, cols: Seq[String]): String = {
    val proj = cols.map(c =>
      s"coalesce(CAST($c AS VARCHAR), '$NullMark') AS $c").mkString(", ")
    val arms = cols.flatMap { det =>
      val deps = cols.filterNot(_ == det)
      val perGroup = deps.map(d => s"count(DISTINCT $d) AS $d").mkString(", ")
      deps.map { d =>
        s"""SELECT '$det' AS det, '$d' AS dep, det_ndv, $d AS max_dep_ndv,
           $d = 1 AS holds
           FROM (SELECT count(*) AS det_ndv, ${deps.map(x => s"max($x) AS $x").mkString(", ")}
                 FROM (SELECT $det, $perGroup FROM p GROUP BY $det))"""
      }
    }
    s"""WITH p AS (SELECT $proj FROM $table)
       ${arms.mkString("\n  UNION ALL\n  ")}
       ORDER BY det, dep"""
  }
}
