package graft.streaming

import graft.{SessionQueries, SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sessionization must run streaming-native: the SAME session_window
  * grouping that q_sess_stats proves equal to the relational definition,
  * over an unbounded stream with stateful window merging. A session that
  * arrives split across micro-batches must still merge. */
class StreamingSessionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streamed session_window counts equal the batch grouping, across batch splits") {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
    val rows = ev.as[(Long, Long, java.sql.Timestamp)].collect()
      .sortBy(r => (r._3.getTime, r._1)) // arrival in event-time order
    // split mid-stream so many sessions straddle the batch boundary
    val batches = Seq(rows.take(rows.length / 2), rows.drop(rows.length / 2))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = input.toDF().toDF("event_id", "user_id", "ts")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${SessionQueries.SessionGapSec} seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = spark.table("sess_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("n_events"))).toSet
      val want = SessionQueries.queries("q_sess_stats")(spark, dir)
        .select("user_id", "start_us", "n_events").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("n_events"))).toSet
      assert(got == want, s"streamed sessions differ: ${got.size} vs ${want.size}")
    } finally q.stop()
  }
}
