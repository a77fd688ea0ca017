package graft.streaming

import graft.LayoutQueries
import graft.validation.PartitionedStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous manifest-stats maintenance: the streaming twin of
  * [[graft.LayoutQueries.statsMerge]]. Each micro-batch of appended rows
  * collapses to its zone-stats partials (the manifest rows for the files
  * that batch would write), appended idempotently to a partitioned side
  * store keyed by batch id; stats-to-date finalize by the same
  * associative merge the batch oracle proves equal to a full rescan.
  * Reference analogue: the incremental enrichment loop that updates
  * per-entity summaries as results stream in
  * (`/root/reference/src/crawl_first/validation_agent.py:787-812`).
  *
  * Scale: state per batch is one row per zone TOUCHED BY THAT BATCH —
  * an append to a 10^12-row table costs stats proportional to the new
  * files, never a rescan; finalize reads #batches × #touched-zones
  * manifest rows. Dynamic partition overwrite makes foreachBatch's
  * at-least-once redelivery exactly-once stats (same discipline as the
  * drift-partial and counter stores).
  */
object StreamingLayout {

  /** Start the stats-maintaining stream over appended rows (needs the
    * zone-stat columns: l_shipdate, l_partkey). */
  def run(stream: DataFrame, statsDir: String, ckptDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = LayoutQueries.zonePartials(batch)
          .withColumn("part", concat(lit("b"), lit(batchId)))
        PartitionedStore.write(p, statsDir)
      }
      .option("checkpointLocation", ckptDir)
      .start()

  /** Zone stats over everything streamed so far — identical rows to
    * `zonePartials` over the union of all micro-batches. */
  def statsToDate(spark: SparkSession, statsDir: String): DataFrame =
    LayoutQueries.mergeZonePartials(spark.read.parquet(statsDir).drop("part"))
}
