package graft.streaming

import graft.validation.{CheckSuite, PartitionedStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous constraint validation: the streaming twin of
  * [[graft.validation.CheckSuite.run]]. Each micro-batch collapses to ONE
  * partial-counter row (the suite's algebraic aggregate — the only thing
  * that ever leaves the batch), appended idempotently to a partitioned
  * side store keyed by batch id; verdicts-to-date finalize from the
  * stored partials. Reference analogue: the incremental per-record
  * validation loop with cache-keyed resume
  * (`/root/reference/src/crawl_first/cli.py:136-150`,
  * `validation_agent.py:787-812`) — here the engine checkpoints offsets
  * and the store's dynamic partition overwrite makes redelivery
  * overwrite-idempotent, so foreachBatch's at-least-once becomes
  * exactly-once counters (the same discipline as the drift-partial
  * store).
  *
  * Scale: state per batch is one row of counters regardless of batch
  * width; finalize reads #batches rows. A 10^12-row table validated as
  * an unbounded stream of partition-sized micro-batches costs the same
  * single pass the batch suite would, plus nothing.
  */
object StreamingChecks {

  /** Start the counter-appending stream (append-only sinks well before
    * the finalize; call [[verdicts]] any time for constraints-to-date). */
  def run(stream: DataFrame, suite: CheckSuite, partialsDir: String,
          ckptDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = suite.partials(batch)
          .withColumn("part", concat(lit("b"), lit(batchId)))
        PartitionedStore.write(p, partialsDir)
      }
      .option("checkpointLocation", ckptDir)
      .start()

  /** Verdicts over everything streamed so far — identical rows to
    * `suite.run` over the union of all micro-batches. */
  def verdicts(spark: SparkSession, suite: CheckSuite,
               partialsDir: String): DataFrame =
    suite.finalizeFrom(spark.read.parquet(partialsDir).drop("part"))

  /** Continuous metric anomaly detection: the stream's verdicts-to-date
    * against a recorded baseline run ([[graft.validation
    * .MetricsRepository]] rows or any prior verdict frame) — the
    * streaming twin of `MetricAnomaly.vs`, so a live pipeline flags a
    * completeness regression mid-stream instead of at the end of the
    * day's batch. Cost: finalize over #batches counter rows + a
    * #checks-row join. */
  def anomalies(spark: SparkSession, suite: CheckSuite, partialsDir: String,
                baseline: DataFrame, maxAbsDelta: Double,
                maxRelDelta: Double): DataFrame =
    graft.validation.MetricAnomaly.vs(
      verdicts(spark, suite, partialsDir), baseline, maxAbsDelta, maxRelDelta)
}
