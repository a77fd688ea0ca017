package graft

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan widening (optimization guide §2.5 "input skew":
  * one huge unsplittable input → repartition immediately after the read).
  *
  * The sandbox testdata ships every table as ONE parquet row group, so a
  * file-source scan is a single task no matter how many cores the session
  * has — every per-row kernel above the scan (decimal-exact sums, HOF
  * folds, distance math) serializes on one core of 32. `widen` inserts a
  * round-robin repartition to the session's default parallelism ONLY when
  * the plan's leaf is narrower; on a production multi-split table the
  * scan is already at least that wide and this is a no-op — no shuffle is
  * added at scale. The repartition count is user-specified, so AQE does
  * not coalesce it back down.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
