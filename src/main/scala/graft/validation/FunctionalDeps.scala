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
