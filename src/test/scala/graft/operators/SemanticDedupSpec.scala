package graft.operators

import graft.{SimilarityQueries, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** SemDeDup semantics pinned against an independent plain-Scala
  * recomputation (the DuckDB oracle `q_dedup_semantic` pins the exact
  * output; this spec pins the algebra on raw collected vectors).
  */
class SemanticDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def bounded = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < SimilarityQueries.SemBound)

  private lazy val vecs: Map[Long, Array[Double]] = bounded
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val drops = SimilarityQueries
    .semanticDrops(bounded).collect()
    .map(r => (r.getAs[Long]("drop_id"), r.getAs[Long]("keep_id"),
      r.getAs[Double]("cos")))

  test("no fabrication: every reported pair is a true near-dup with keep < drop") {
    assert(drops.nonEmpty, "fixture must contain semantic near-dups")
    drops.foreach { case (d, k, c) =>
      assert(k < d, s"keep_id $k !< drop_id $d")
      val real = cos(vecs(d), vecs(k))
      assert(real >= SimilarityQueries.SemTau,
        s"pair ($k, $d) reported but true cos $real < tau")
      assert(math.abs(real - c) < 5e-4, s"reported cos $c != recomputed $real")
    }
  }

  test("within-cluster completeness: every co-clustered near-dup pair drops its larger id") {
    val e = bounded.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val assign = SimilarityQueries.trainedScored(e, 1)
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cell")).toMap
    val dropIds = drops.map(_._1).toSet
    val expected = (for {
      (a, ca) <- assign; (b, cb) <- assign
      if a < b && ca == cb && cos(vecs(a), vecs(b)) >= SimilarityQueries.SemTau
    } yield b).toSet
    assert(expected == dropIds,
      s"drop set mismatch: missing ${expected -- dropIds}, extra ${dropIds -- expected}")
  }

  test("the smallest id of every cluster is never dropped") {
    val e = bounded.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val minPerCell = SimilarityQueries.trainedScored(e, 1)
      .filter(col("rk") === 1)
      .groupBy("cell").agg(min("vec_id").as("m"))
      .collect().map(_.getAs[Long]("m")).toSet
    val dropIds = drops.map(_._1).toSet
    assert(minPerCell.intersect(dropIds).isEmpty,
      "a cluster's min id can never have a smaller-id neighbor")
  }
}
