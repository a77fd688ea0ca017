package graft.operators

import graft.{SimilarityQueries, SparkTestBase}
import org.apache.spark.sql.functions._

/** Accuracy contract of the LSH ANN path: mean recall@5 vs the brute-force
  * baseline must hold on the synthetic embeddings table — which is the LSH
  * worst case (isotropic random vectors, no cluster structure), so passing
  * here bounds real-data behavior from below.
  */
class AnnRecallSpec extends SparkTestBase {

  val sfDir = "/root/testdata/sf0.001"

  test("LSH ANN mean recall@5 >= 0.9 vs brute force") {
    val recall = SimilarityQueries.queries("q_ann_recall_lsh")(spark, sfDir)
    val m = recall.agg(avg("recall").as("mean"), count(lit(1)).as("n")).head()
    assert(m.getLong(1) > 0, "no queries")
    assert(m.getDouble(0) >= 0.9, s"mean recall ${m.getDouble(0)} < 0.9")
  }

  test("LSH top-k ranks candidates by exact cosine (subset of brute force)") {
    val bf = SimilarityQueries.queries("q_ann_topk_bruteforce")(spark, sfDir)
      .select(col("q_id"), col("c_id"), col("cos").as("bf_cos"))
    val lsh = SimilarityQueries.lshTopK(spark, sfDir)
    // every LSH hit that brute force also ranked must carry the same cosine
    val joined = lsh.join(bf, Seq("q_id", "c_id"))
      .filter(col("cos") =!= col("bf_cos"))
    assert(joined.count() == 0, "cosine mismatch between LSH and BF paths")
  }
}
