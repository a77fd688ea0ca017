package graft.validation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unary inclusion-dependency discovery — the CROSS-TABLE face of the
  * profiler: which columns are contained in which (the referential
  * candidates a constraint engine should suggest before anyone declares
  * a foreign key). Re-derived from the published SINDY shape (Kruse/
  * Papenbrock/Naumann, "Scaling Out the Discovery of Inclusion
  * Dependencies", BTW 2015): turn every (table, column) into a set of
  * distinct cells, group by VALUE, and count per attribute pair how many
  * of the lhs's distinct values co-occur with the rhs — lhs ⊆ rhs iff
  * that count equals the lhs's distinct count. One distinct pass + one
  * value-shuffle + one pair aggregation; NEVER a pairwise table join.
  *
  * Reference semantics: the study-lookup referential checks
  * (`/root/reference/src/crawl_first/analysis.py:1207-1210`) assume the
  * FK graph is known; this operator DISCOVERS it.
  *
  * Scale shape (100 TB): cells are DISTINCT (value, attr), so a value
  * group holds at most #attributes rows — frequency skew in the raw
  * data cannot create a hot key. The candidate-pair explosion is
  * O(#attrs²) per distinct value in the worst case but only over attrs
  * sharing that value; with k attributes the whole pair frame is
  * bounded by k × cells. Containment counts are algebraic (map-side
  * combine). Values ride as strings so heterogeneous key types compare
  * bit-stably in both engines.
  */
object Inclusion {

  /** Attributes as (qualifiedName, table, column). */
  type Attr = (String, String, String)

  /** Distinct INDs among `attrs` over tables resolved by `load`:
    * rows (lhs, rhs, lhs_ndv) with lhs ⊆ rhs, lhs ≠ rhs. */
  def inds(load: String => DataFrame, attrs: Seq[(String, String)]): DataFrame = {
    val cells = attrs.map { case (t, c) =>
      load(t).select(col(c).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .distinct()
        .select(col("v"), lit(s"$t.$c").as("attr"))
    }.reduce(_.unionAll(_))
    val groups = cells.groupBy("v").agg(collect_set(col("attr")).as("attrs"))
    val pairs = groups
      .select(explode(col("attrs")).as("lhs"), col("attrs"))
      .select(col("lhs"), explode(col("attrs")).as("rhs"))
      .filter(col("lhs") =!= col("rhs"))
      .groupBy("lhs", "rhs").agg(count(lit(1L)).as("both"))
    val ndv = cells.groupBy(col("attr").as("lhs")).agg(count(lit(1L)).as("lhs_ndv"))
    pairs.join(ndv, "lhs")
      .filter(col("both") === col("lhs_ndv"))
      .select(col("lhs"), col("rhs"), col("lhs_ndv"))
      .orderBy("lhs", "rhs")
  }

  /** DuckDB twin over the same static attribute list — the direct
    * pairwise-containment formulation (fine at oracle scale; the Spark
    * side's value-grouping is the 100 TB shape). */
  def duckSql(attrs: Seq[(String, String)]): String = {
    val cellArms = attrs.map { case (t, c) =>
      s"SELECT DISTINCT CAST($c AS VARCHAR) AS v, '$t.$c' AS attr FROM $t WHERE $c IS NOT NULL"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH cells AS (
         $cellArms),
       ndv AS (SELECT attr, count(*) AS n FROM cells GROUP BY attr),
       co AS (
         SELECT x.attr AS lhs, y.attr AS rhs, count(*) AS both
         FROM cells x JOIN cells y ON x.v = y.v AND x.attr <> y.attr
         GROUP BY 1, 2)
       SELECT co.lhs, co.rhs, ndv.n AS lhs_ndv
       FROM co JOIN ndv ON ndv.attr = co.lhs
       WHERE co.both = ndv.n
       ORDER BY co.lhs, co.rhs"""
  }

  /** The TPC-H-ish key attributes the `q_v_inclusion` oracle sweeps —
    * discovery recovers the full FK graph with no schema hints. */
  val TestdataKeyAttrs: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey", "nation" -> "n_regionkey",
    "nation" -> "n_nationkey", "customer" -> "c_custkey",
    "customer" -> "c_nationkey", "supplier" -> "s_suppkey",
    "supplier" -> "s_nationkey", "part" -> "p_partkey",
    "orders" -> "o_custkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey")
}
