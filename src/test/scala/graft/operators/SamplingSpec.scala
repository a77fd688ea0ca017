package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private def corpus = {
    val s = spark
    s.range(20000).select(col("id"),
      element_at(array(lit("a"), lit("b"), lit("c")),
        (col("id") % 3 + 1).cast("int")).as("grp"))
  }

  test("stratified is a pure scan-stage predicate — no exchange planned") {
    val sampled = Sampling.stratified(corpus, "grp", col("id"),
      Map("a" -> 128, "b" -> 32))
    val plan = sampled.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("per-stratum rates track k/256 and re-runs draw the same sample") {
    val sampled = Sampling.stratified(corpus, "grp", col("id"),
      Map("a" -> 128, "b" -> 32)).cache()
    try {
      val byGrp = sampled.groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // ~6667 rows per stratum; md5 is uniform so ±15% is generous
      assert(byGrp.getOrElse("c", 0L) == 0L, "absent stratum must drop")
      assert(math.abs(byGrp("a") - 6667 * 128.0 / 256) < 6667 * 0.15 * 0.5)
      assert(math.abs(byGrp("b") - 6667 * 32.0 / 256) < 6667 * 0.15 * 0.125 + 40)
      val again = Sampling.stratified(corpus, "grp", col("id"),
        Map("a" -> 128, "b" -> 32)).collect().map(_.getLong(0)).toSet
      assert(again == sampled.collect().map(_.getLong(0)).toSet,
        "membership must be a pure function of the id")
    } finally sampled.unpersist()
  }

  test("exact-k keeps min(k, |stratum|) rows, deterministically") {
    val small = corpus.filter(col("grp") =!= "c" || col("id") < 30)
    val got = Sampling.stratifiedExactK(small, "grp", col("id"), 50)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 50 && got("b") == 50)
    assert(got("c") == 10, s"stratum c has 10 members (ids 0..29 % 3): $got")
    val a = Sampling.stratifiedExactK(small, "grp", col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedExactK(small, "grp", col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
