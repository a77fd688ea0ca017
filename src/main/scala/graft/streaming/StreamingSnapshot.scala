package graft.streaming

import graft.SnapshotQueries
import graft.validation.PartitionedStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous baseline-fingerprint maintenance: the streaming twin of
  * [[graft.SnapshotQueries.partitionFingerprints]]. Each micro-batch of
  * appended rows collapses to its per-partition fingerprint partials
  * (count / xor / sum — all associative+commutative), appended
  * idempotently to a partitioned side store keyed by batch id; the
  * baseline fingerprint table finalizes by [[SnapshotQueries
  * .mergeFingerprints]], proven equal to a full recompute. This is how
  * the snapshot-reconciliation baseline stays current on a table that
  * never stops ingesting: the NEXT reconciliation diffs against
  * fingerprints that cost O(new rows) to maintain, not a 100 TB rescan.
  * Reference analogue: the content-keyed incremental re-assessment loop
  * (`/root/reference/src/crawl_first/cache.py:27-29`,
  * `validation_agent.py:787-812`).
  *
  * Same at-least-once-to-exactly-once discipline as the drift/layout
  * stores: partials land under a batch-id partition with dynamic
  * partition overwrite, so a redelivered batch overwrites itself.
  */
object StreamingSnapshot {

  /** Start the fingerprint-maintaining stream. `stream` must carry the
    * orders columns the canonical row hash reads (o_orderkey, o_custkey,
    * o_orderstatus, o_totalprice, o_orderdate, o_orderpriority) plus
    * `part`. */
  def run(stream: DataFrame, fpDir: String, ckptDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = SnapshotQueries.partitionFingerprints(batch)
          .withColumnRenamed("part", "snap_part")
          .withColumn("part", concat(lit("b"), lit(batchId)))
        PartitionedStore.write(p, fpDir)
      }
      .option("checkpointLocation", ckptDir)
      .start()

  /** Baseline fingerprints over everything streamed so far — identical
    * rows to `partitionFingerprints` over the union of all batches. */
  def fingerprintsToDate(spark: SparkSession, fpDir: String): DataFrame =
    SnapshotQueries.mergeFingerprints(
      spark.read.parquet(fpDir).drop("part")
        .withColumnRenamed("snap_part", "part"))
}
