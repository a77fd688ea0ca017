package graft.streaming

import graft.{SnapshotQueries, SparkTestBase}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed baseline fingerprints must equal a direct recompute over
  * the union of all micro-batches (merge ≡ rescan for count/xor/sum), and
  * a reconciliation against the streamed baseline must reach the same
  * dirty-partition verdicts as the all-batch query. */
class StreamingSnapshotSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private type Tup = (Long, Long, String, Double, java.sql.Timestamp, String)

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.getAs[String]("part"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("fp_xor"), r.getAs[Long]("fp_sum")))
    .sortBy(_._1).toSeq

  test("streamed fingerprints across three micro-batches equal a direct recompute") {
    import spark.implicits._
    val base = SnapshotQueries.baseSnapshot(spark, dir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val rows = base
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .as[Tup].collect()
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("stream_snap").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tup]
    val q = StreamingSnapshot.run(
      input.toDF().toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        .withColumn("part", date_format(col("o_orderdate"), "yyyy-MM")),
      s"$tmp/fp", s"$tmp/ckpt")
    try {
      batches.foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = canon(StreamingSnapshot.fingerprintsToDate(spark, s"$tmp/fp"))
      val want = canon(SnapshotQueries.partitionFingerprints(base))
      assert(got == want)
      assert(got.nonEmpty)

      // reconciliation against the STREAMED baseline reaches the same
      // verdicts as against a fresh batch fingerprint pass
      val cur = SnapshotQueries.curSnapshot(spark, dir)
      val fromStream = SnapshotQueries.dirtyPartitions(
          StreamingSnapshot.fingerprintsToDate(spark, s"$tmp/fp"),
          SnapshotQueries.partitionFingerprints(cur))
        .collect().map(r => r.getAs[String]("part") -> r.getAs[String]("status"))
        .sortBy(_._1).toSeq
      val fromBatch = SnapshotQueries.dirtyPartsQuery(spark, dir)
        .collect().map(r => r.getAs[String]("part") -> r.getAs[String]("status"))
        .sortBy(_._1).toSeq
      assert(fromStream == fromBatch)
    } finally q.stop()
  }

  test("redelivered batch overwrites itself (exactly-once fingerprints)") {
    import spark.implicits._
    val base = SnapshotQueries.baseSnapshot(spark, dir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .limit(50)
    val tmp = java.nio.file.Files.createTempDirectory("stream_snap2").toString
    // simulate foreachBatch redelivery: write batch 0 TWICE via the same
    // store discipline, then finalize — counts must not double
    val p = SnapshotQueries.partitionFingerprints(base)
      .withColumnRenamed("part", "snap_part")
      .withColumn("part", lit("b0"))
    graft.validation.PartitionedStore.write(p, s"$tmp/fp")
    graft.validation.PartitionedStore.write(p, s"$tmp/fp")
    val got = canon(StreamingSnapshot.fingerprintsToDate(spark, s"$tmp/fp"))
    val want = canon(SnapshotQueries.partitionFingerprints(base))
    assert(got == want)
  }
}
