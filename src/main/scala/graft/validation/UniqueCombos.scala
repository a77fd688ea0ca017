package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unique-column-combination (candidate-key) discovery — the third leg
  * of the dependency-discovery trio ([[Inclusion]] finds foreign keys,
  * [[FunctionalDeps]] finds determinants, this finds KEYS): a column
  * set is a UCC iff its distinct count equals the row count. Published
  * lineage: the level-wise lattice walk of DUCC/HyUCC (Heise et al.,
  * Papenbrock & Naumann) — re-derived as two aggregation passes with
  * Apriori pruning between them (a superset of a unique set is never
  * minimal, so level 2 only tests pairs of non-unique columns).
  *
  * Reference semantics: the engine's uniqueness check
  * (`validation_agent.py:787-812` resume keys; `osm.py:639-655`
  * keep-first dedup) VERIFIES a declared key; this DISCOVERS the
  * candidates to declare.
  *
  * Scale shape (100 TB): pass 1 is one aggregation (k distinct
  * counters); the driver sees k longs, never data. Pass 2 aggregates
  * only the pruned pair list. Exact countDistinct plans an Expand
  * ×(#counters) — the oracle rung; at 10^12 rows run pass 1 on
  * approx_count_distinct (mergeable HLL, no Expand), keep pairs whose
  * approximate ndv is within HLL error of n, and confirm survivors
  * exactly — uniqueness claims must be exact, near-uniqueness cannot
  * be. Nulls ride the [[FunctionalDeps.NullMark]] sentinel so a null
  * is a value for counting (a true PK additionally needs a null-free
  * column — the profiler's completeness row answers that).
  */
object UniqueCombos {

  /** Level-1 + pruned level-2 UCC sweep over `cols`:
    * (combo, level, ndv, n_rows, unique), ordered by (level, combo). */
  def uccs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val proj = df.select(cols.map(c =>
      coalesce(col(c).cast("string"), lit(FunctionalDeps.NullMark)).as(c)): _*)
      .cache()
    val l1aggs = count(lit(1L)).as("n") +:
      cols.map(c => countDistinct(col(c)).as(c))
    val l1row = proj.agg(l1aggs.head, l1aggs.tail: _*).collect().head
    val n = l1row.getLong(0)
    val ndv1 = cols.zipWithIndex.map { case (c, i) => c -> l1row.getLong(i + 1) }.toMap
    val uniques = cols.filter(c => ndv1(c) == n).toSet
    // Apriori prune: a pair containing a unique column is unique but
    // not minimal — never tested, never emitted (same rule in the twin)
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }
      .filter { case (a, b) => !uniques(a) && !uniques(b) }.toSeq
    val s = df.sparkSession
    import s.implicits._
    val l1 = cols.map(c => (c, 1, ndv1(c), n, ndv1(c) == n))
      .toDF("combo", "level", "ndv", "n_rows", "unique")
    val l2 =
      if (pairs.isEmpty) l1.limit(0)
      else {
        val aggs = pairs.map { case (a, b) =>
          countDistinct(col(a), col(b)).as(s"${a}+${b}")
        }
        val row2 = proj.agg(aggs.head, aggs.tail: _*)
        val arms: Seq[Column] = pairs.zipWithIndex.map { case ((a, b), i) =>
          struct(lit(s"$a+$b").as("combo"), lit(2).as("level"),
            col(s"${a}+${b}").as("ndv"), lit(n).as("n_rows"),
            (col(s"${a}+${b}") === n).as("unique"))
        }
        row2.select(explode(array(arms: _*)).as("r")).select(col("r.*"))
      }
    proj.unpersist()
    l1.unionAll(l2).orderBy("level", "combo")
  }

  /** DuckDB twin over the same static column list: all pairs are
    * stated, the level-1 CTE's data decides which pair rows survive —
    * the generated SQL stays total while pruning mirrors the Spark
    * side exactly. */
  def duckSql(table: String, cols: Seq[String]): String = {
    val proj = cols.map(c =>
      s"coalesce(CAST($c AS VARCHAR), '${FunctionalDeps.NullMark}') AS $c")
      .mkString(", ")
    val l1aggs = ("count(*) AS n" +:
      cols.map(c => s"count(DISTINCT $c) AS $c")).mkString(", ")
    val l1arms = cols.map(c =>
      s"SELECT '$c' AS combo, 1 AS level, $c AS ndv, n AS n_rows, $c = n AS \"unique\" FROM l1")
    val l2arms = cols.combinations(2).map { case Seq(a, b) =>
      s"""SELECT '$a+$b', 2,
         (SELECT count(*) FROM (SELECT DISTINCT $a, $b FROM p)), n,
         (SELECT count(*) FROM (SELECT DISTINCT $a, $b FROM p)) = n
         FROM l1 WHERE $a < n AND $b < n"""
    }.toSeq
    s"""WITH p AS (SELECT $proj FROM $table),
       l1 AS (SELECT $l1aggs FROM p)
       ${(l1arms ++ l2arms).mkString("\n  UNION ALL\n  ")}
       ORDER BY level, combo"""
  }
}
