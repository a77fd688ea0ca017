package graft.operators

import graft.{SimilarityQueries, SparkTestBase}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss ±1 projection: values match a plain-Scala
  * recomputation, top-k recall in the projected space is non-trivial on
  * the isotropic worst case and IMPROVES with projection width (the JL
  * distortion bound √(log n / m) shrinking), and the projection is a
  * pure narrow map (no shuffle before the ranking join).
  */
class JlSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("projection values match plain-Scala recomputation") {
    val e = graft.Tables(spark, dir, "embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val got = e.select(col("vec_id"),
        SimilarityQueries.jlProject(col("emb"), 8).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    raw.foreach { case (id, emb) =>
      val want = (0 until 8).map(j =>
        emb.indices.map(d => emb(d) * SimilarityQueries.jlSign(j, d)).sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"vec $id: $g vs $w")
      }
    }
  }

  /** Deterministic clustered 64-dim corpus (unit centers + small noise) —
    * the regime real embedding tables are in; label 0 marks the query set. */
  private def clustered = {
    import spark.implicits._
    def u(seed: Long): Double =
      (graft.images.ImageCodec.mix64(seed) >>> 11) * (1.0 / (1L << 53)) - 0.5
    val rows = for (c <- 0 until 40; mem <- 0 until 20) yield {
      val center = Array.tabulate(64)(d => u(c * 1009L + d))
      val cn = math.sqrt(center.map(x => x * x).sum)
      val noisy = Array.tabulate(64)(d =>
        center(d) / cn + 0.08 * u(c * 7919L + mem * 131L + d))
      val n = math.sqrt(noisy.map(x => x * x).sum)
      ((c * 20 + mem).toLong, if (mem == 0) 0 else 1, noisy.map(_ / n).toSeq)
    }
    rows.toDF("vec_id", "label", "emb")
  }

  private def recallAt5(m: Int, frame: org.apache.spark.sql.DataFrame): Double = {
    import org.apache.spark.sql.expressions.Window
    val e = frame.localCheckpoint()
    def topk(frame: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val q = frame.filter(col("label") === 0)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      val c = frame.select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      q.join(c, col("q_id") =!= col("c_id"))
        .withColumn("cos", SimilarityQueries.cosine(col("q_emb"), col("c_emb")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = topk(e)
    val proj = topk(e.select(col("vec_id"), col("label"),
      SimilarityQueries.jlProject(col("emb"), m).as("emb")))
    exact.intersect(proj).size.toDouble / exact.size
  }

  test("isotropic worst case: recall above chance and monotone in width") {
    val iso = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
    val r16 = recallAt5(16, iso)
    val r32 = recallAt5(32, iso)
    // isotropic random embeddings are the worst case for ANY distance
    // sketch (neighbor cos ≈ 0.37 vs 0.29 background); chance overlap on
    // top-5 of ~500 is ~0.01 — the sketch must beat that and tighten
    // with width (JL distortion ~ √(log n / m))
    assert(r16 > 0.03, s"recall@5 at m=16 is $r16 — no signal")
    assert(r32 > r16, s"recall must improve with width: m=32 $r32 <= m=16 $r16")
  }

  test("clustered corpus (the 100 TB regime): m=16 retrieves the right cluster") {
    // exact-rank agreement is the wrong metric here: cluster-mates are
    // near-ties (cos ≈ 0.97 apart by <0.01), so any sketch reshuffles
    // their order. The claim that matters: projected top-5 stays INSIDE
    // the query's cluster.
    import org.apache.spark.sql.expressions.Window
    val e = clustered.select(col("vec_id"), col("label"),
      SimilarityQueries.jlProject(col("emb"), 16).as("emb")).localCheckpoint()
    val q = e.filter(col("label") === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val top = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos", SimilarityQueries.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("q_id", "c_id").collect()
    val precision = top.count(r =>
      r.getLong(0) / 20 == r.getLong(1) / 20).toDouble / top.length
    assert(precision >= 0.9,
      s"cluster precision at m=16 is $precision — the 4x-cheaper rung must hold the regime it is for")
  }
}
