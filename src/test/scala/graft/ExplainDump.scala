package graft

import graft.images.ImageGen
import org.apache.spark.sql.functions._

/** Plan inspection: dump formatted plans for the hot paths and grep-able
  * invariants (pushdown, pruning, broadcast). Run:
  * sbt "Test/runMain graft.ExplainDump"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = ImageGen.ensure(spark, 2000L, "target/test-images")
    val images = ImageGen.images(spark, dir)

    println("=== light projection (must NOT read bytes) ===")
    images.select("image_id", "part", "w", "h", "caption")
      .filter(col("w") > 0).explain("formatted")

    println("=== partition-pruned resume scan (part filter → PartitionFilters) ===")
    images.filter(!col("part").isin("p1", "p5")).groupBy("part").count().explain("formatted")

    println("=== q_j1 join agg (expect broadcast hash join) ===")
    SparkEntry.queries("q_j1_join_agg")(spark, "/root/testdata/sf0.001").explain("formatted")

    println("=== keyChecks join (expect single exchange per side, window reuse) ===")
    val (v, _) = graft.validation.ImageSuite.keyChecks(
      images.select("image_id", "part", "w", "h", "caption"),
      ImageGen.captions(spark, dir), "x")
    v.explain("formatted")

    println("=== salted-agg rule (expect TWO HashAggregate pairs, salt in inner keys) ===")
    SparkEntry.queries("q_a1b_salted_rule")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    println("=== LSH ANN top-k (expect shuffle-hash/sort-merge on (t,bucket), NO cartesian) ===")
    SparkEntry.queries("q_ann_topk_lsh")(spark, "/root/testdata/sf0.001")
      .explain("formatted")
    spark.stop()
  }
}
