package graft.streaming

import graft.validation.{MaskProfile, PartitionedStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous structure profiling: the streaming twin of
  * [[graft.validation.MaskProfile.masks]]. The mask histogram is a pure
  * sum-monoid on the FULL mask (class substitution is per-row, the
  * compressed rollup is a function of full-mask keys), so each
  * micro-batch collapses to its own (full_mask, n) partial — appended
  * idempotently under `part=b<id>` with the same dynamic-partition-
  * overwrite discipline as the drift/zone-stats stores (an at-least-once
  * redelivery REPLACES the batch's own rows) — and the profile-to-date
  * finalizes by sum-merge + the shared ranking finalize. A new mask
  * appearing mid-stream (a producer silently changing a field's format —
  * the thing a structure profile exists to catch) surfaces in the very
  * next finalize without re-reading done batches.
  *
  * Scale: state per batch is one row per DISTINCT FULL MASK in that
  * batch (a handful for structurally uniform fields); finalize reads
  * #batches × #masks rows, never data.
  */
object StreamingMasks {

  /** Start the per-micro-batch mask-partial fold into `storeDir`.
    * `colSql` as in [[MaskProfile.masks]]. */
  def run(stream: DataFrame, colSql: String, storeDir: String,
          ckptDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = MaskProfile.fullMaskCounts(batch, colSql)
          .withColumn("part", concat(lit("b"), lit(batchId)))
        PartitionedStore.write(p, storeDir)
      }
      .option("checkpointLocation", ckptDir)
      .start()

  /** Ranked mask profile over everything streamed so far — identical
    * rows to [[MaskProfile.masks]] over the union of all micro-batches. */
  def masksToDate(spark: SparkSession, storeDir: String,
                  topK: Int = 20): DataFrame =
    MaskProfile.fromFullMaskCounts(
      MaskProfile.mergeFullMaskCounts(
        spark.read.parquet(storeDir).drop("part")),
      topK)
}
