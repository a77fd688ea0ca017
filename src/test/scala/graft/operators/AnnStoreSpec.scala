package graft.operators

import graft.{AnnStore, SimilarityQueries, SparkTestBase, Tables}

/** The persisted ANN store must be a pure function of the tier: serving
  * from the store returns bit-identical results to training + serving in
  * one pass (the equivalence that makes the end-to-end DuckDB oracles
  * remain valid after the r5 amortization).
  */
class AnnStoreSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("PQ: store-served top-k == freshly trained top-k") {
    val fresh = SimilarityQueries.pqTopK(Tables(spark, dir, "embeddings"))
    val served = AnnStore.pqTopKStored(spark, dir)
    assert(rows(served) == rows(fresh))
  }

  test("IVF-PQ: store-served top-k == freshly trained top-k") {
    val fresh = SimilarityQueries.ivfPqTopK(Tables(spark, dir, "embeddings"))
    val served = AnnStore.ivfPqTopKStored(spark, dir)
    assert(rows(served) == rows(fresh))
  }

  test("residual IVFADC: store-served top-k == freshly trained top-k") {
    val fresh = SimilarityQueries.ivfPqResidualTopK(Tables(spark, dir, "embeddings"))
    val served = AnnStore.ivfPqResidualTopKStored(spark, dir)
    assert(rows(served) == rows(fresh))
  }

  test("store publication is write-once (second ensure is a no-op)") {
    val path = AnnStore.ensure(spark, dir)
    val m = java.nio.file.Paths.get(path, "_SUCCESS")
    val t0 = java.nio.file.Files.getLastModifiedTime(m)
    AnnStore.ensure(spark, dir)
    assert(java.nio.file.Files.getLastModifiedTime(m) == t0)
  }
}
