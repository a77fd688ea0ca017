package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The join half of the skew story (north-star: "skew on hot keys is
  * handled by explicit salting and AQE skew-join"): the salted-aggregate
  * rule covers aggregations; for JOINS the engine relies on AQE's
  * OptimizeSkewedJoin splitting oversized shuffle partitions at runtime.
  * This spec proves that reliance is real — a hot-key sort-merge join
  * actually plans `skew=true` under the session's AQE settings — so a
  * config regression that silently disables it fails CI.
  */
class SkewJoinSpec extends SparkTestBase {

  private val tuned = Seq(
    // production defaults target 256 MB partitions; scaled down so an
    // in-test hot key crosses the skew threshold
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k")

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val before = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // ~95% of the probe side shares one hot key; padding makes the hot
      // shuffle partition exceed the (scaled-down) skew threshold
      val left = spark.range(200000).select(
        when(col("id") % 100 < 95, lit("hot"))
          .otherwise(concat(lit("k"), col("id") % 100)).as("k"),
        col("id").as("v"),
        lpad(lit("x"), 64, "x").as("pad"))
      val right = spark.range(100).select(concat(lit("k"), col("id")).as("k"), lit(1).as("w"))
        .union(Seq(("hot", 1)).toDF("k", "w"))
      val j = left.join(right, Seq("k"))
      // execute THIS frame's QueryExecution (a .count() builds a separate
      // one whose adaptive plan finalizes instead) so the inspected plan
      // is the post-AQE final plan
      assert(j.collect().length == 200000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
