package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (SURVEY §4 / the 100 TB join story):
  * writing both sides bucketed+sorted on the join key lets the planner
  * emit a sort-merge join with NO shuffle exchange — the id-keyed
  * image↔caption join at 10^12 rows would be laid out exactly this way
  * (Iceberg `bucket(n, image_id)` partition transform).
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val imgs = s.range(20000).select(col("id").as("image_id"),
        (col("id") % 97).as("w"))
      val caps = s.range(20000).select(col("id").as("image_id"),
        concat(lit("cap-"), col("id")).as("caption"))
      val base = new java.io.File("target/bucketed").getAbsolutePath
      imgs.write.mode("overwrite")
        .option("path", s"$base/imgs")
        .bucketBy(8, "image_id").sortBy("image_id").saveAsTable("b_imgs")
      caps.write.mode("overwrite")
        .option("path", s"$base/caps")
        .bucketBy(8, "image_id").sortBy("image_id").saveAsTable("b_caps")

      val joined = s.table("b_imgs").join(s.table("b_caps"), "image_id")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 20000)

      // the unbucketed twin DOES shuffle — the contrast is the point
      val unbucketed = imgs.join(caps, "image_id")
      val plan2 = unbucketed.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan2.contains("Exchange"), plan2)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS b_imgs")
      s.sql("DROP TABLE IF EXISTS b_caps")
    }
  }
}
