package graft

import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: stage counts are monotone, stages do what
  * they claim, and the run is deterministic.
  */
class PipelineSpec extends SparkTestBase {

  val sfDir = "/root/testdata/sf0.001"
  lazy val (curated, stages) = Pipeline.curate(spark, sfDir)
  lazy val counts: Map[String, Long] = stages.map(s => s.stage -> s.n_rows).toMap

  test("stage counts are monotone non-increasing after enrichment") {
    assert(stages.map(_.stage) == Seq("ingest", "enrich", "quality_gate",
      "dedup_exact", "dedup_near"))
    assert(counts("ingest") == counts("enrich"), "enrichment must not drop rows")
    assert(counts("enrich") >= counts("quality_gate"))
    assert(counts("quality_gate") >= counts("dedup_exact"))
    assert(counts("dedup_exact") >= counts("dedup_near"))
    assert(counts("dedup_near") > 0)
  }

  test("curated output carries no duplicate content digests") {
    val dups = curated.groupBy("content_md5").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("quality gate enforces its thresholds") {
    assert(curated.filter(col("n_tokens") < 5 || col("punct_ratio") > 0.2 ||
      col("stopword_ratio") > 0.8).count() == 0)
  }

  test("pipeline is deterministic across runs") {
    val (c2, s2) = Pipeline.curate(spark, sfDir)
    assert(s2.map(s => s.stage -> s.n_rows).toMap == counts)
    assert(c2.select("doc_id").orderBy("doc_id").collect().toSeq ==
      curated.select("doc_id").orderBy("doc_id").collect().toSeq)
  }
}
