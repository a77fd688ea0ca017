package graft.validation

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Idempotent per-partition side-store writer shared by the resume key
  * index and the drift-partial store: dynamic partition overwrite keyed by
  * `part` (a crash-retry REPLACES the crashed run's rows instead of
  * duplicating them) plus a listing-cache refresh (the overwrite deletes
  * files the session's FileStatusCache may still serve).
  *
  * Also migrates, once, a store written by the legacy flat-append layout
  * (root-level parquet files with `part` as a data column): without the
  * migration, a partitioned write into such a directory would leave a
  * mixed layout that fails partition discovery on every later read.
  */
object PartitionedStore {

  def write(df: DataFrame, dir: String): Unit = {
    migrateLegacy(df.sparkSession, dir)
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part").parquet(dir)
    df.sparkSession.catalog.refreshByPath(dir)
  }

  /** Rewrite a legacy flat store into the partitioned layout via a
    * temp-dir swap. No-op when the dir is missing or already partitioned.
    */
  private def migrateLegacy(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val rootFiles = fs.listStatus(p).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (rootFiles.isEmpty) return // already partitioned (or empty)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".migrating")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    spark.catalog.refreshByPath(dir)
  }
}
