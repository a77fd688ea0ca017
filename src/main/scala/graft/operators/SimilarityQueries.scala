package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine as the correctness baseline, random-hyperplane LSH
  * bucketing as the 100 TB scale path (candidates share a signature bucket;
  * no all-pairs shuffle). Reference analogue: best-of-N selection
  * (`/root/reference/src/crawl_first/analysis.py:645-671`) and nearest-k
  * ranking (`osm.py:563-575`).
  *
  * Dot products run through `zip_with` + `aggregate` on double-cast arrays
  * (builtin HOFs, codegen-friendly, sequential fold → deterministic order).
  */
object SimilarityQueries {

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Deterministic hyperplane: w(p, d) = first-hex-nibble(md5("p:d")) − 7.5
    * — same values the DuckDB oracle derives in SQL.
    */
  def hyperplane(p: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { d =>
      val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
      ((hex(0) >> 4) & 0xf).toDouble - 7.5
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pairwise cosine on a bounded id range — value-level oracle for the
    // kernels (no threshold filter: row set is fixed, only values compared).
    "q_sim_pairs_cos" -> ((s, dir) => {
      val e = embs(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      val a = e.select(col("vec_id").as("a_id"), col("emb").as("a_emb"))
      val b = e.select(col("vec_id").as("b_id"), col("emb").as("b_emb"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(cosine(col("a_emb"), col("b_emb")), 4).as("cos"))
        .orderBy("a_id", "b_id")
    }),

    // Brute-force cosine top-k: every label-0 vector queries the full table.
    // The all-pairs baseline the IVF/LSH path is validated against.
    "q_ann_topk_bruteforce" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = embs(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("emb"))
      val q = e.filter(col("label") === 0)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      val cand = e.select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      q.join(cand, col("q_id") =!= col("c_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("c_id"), round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rk")
    }),

    // Random-hyperplane LSH signatures (8 bits, md5-derived hyperplanes):
    // the bucketed ANN path — one shuffle on the bucket, candidates only
    // within buckets. Oracle checks the signature assignment itself.
    // Hyperplane weights w(plane, d) = nibble(md5("plane:d")) − 7.5 are
    // CONSTANTS: computed once on the driver and embedded as literal
    // arrays, so the scan stage is a single narrow projection (no join,
    // no per-row md5 — the plan the optimizer can't derive itself).
    "q_sim_lsh_buckets" -> ((s, dir) => {
      val planes = 8
      val e = embs(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      val bucket = (0 until planes).map { p =>
        val w = hyperplane(p, 64)
        when(dot(col("emb"), typedlit(w)) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      e.select(col("vec_id"), bucket.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec"))
        .orderBy("bucket")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_sim_pairs_cos" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings WHERE vec_id < 20),
         pairs AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.emb AS a_emb, b.emb AS b_emb
           FROM e a JOIN e b ON a.vec_id < b.vec_id),
         dots AS (
           SELECT a_id, b_id,
             sum(a_emb[i] * b_emb[i]) AS dp,
             sum(a_emb[i] * a_emb[i]) AS na,
             sum(b_emb[i] * b_emb[i]) AS nb
           FROM pairs, UNNEST(range(1, 65)) AS u(i)
           GROUP BY 1, 2)
         SELECT a_id, b_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
         FROM dots""",
    "q_ann_topk_bruteforce" ->
      """WITH e AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         pairs AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.emb AS q_emb, c.emb AS c_emb
           FROM (SELECT * FROM e WHERE label = 0) q
           JOIN e c ON q.vec_id <> c.vec_id),
         dots AS (
           SELECT q_id, c_id,
             sum(q_emb[i] * c_emb[i]) AS dp,
             sum(q_emb[i] * q_emb[i]) AS nq,
             sum(c_emb[i] * c_emb[i]) AS nc
           FROM pairs, UNNEST(range(1, 65)) AS u(i)
           GROUP BY 1, 2),
         ranked AS (
           SELECT q_id, c_id, dp / (sqrt(nq) * sqrt(nc)) AS cos,
             row_number() OVER (PARTITION BY q_id
               ORDER BY dp / (sqrt(nq) * sqrt(nc)) DESC, c_id) AS rk
           FROM dots)
         SELECT q_id, rk, c_id, round(cos, 4) AS cos
         FROM ranked WHERE rk <= 5""",
    "q_sim_lsh_buckets" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         planes AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS plane),
         proj AS (
           SELECT vec_id, plane,
             sum(emb[d+1] * (CAST(('0x' || substr(md5(CAST(plane AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) AS BIGINT) - 7.5)) AS proj
           FROM e, planes, UNNEST(range(0, 64)) AS u(d)
           GROUP BY 1, 2),
         sigs AS (
           SELECT vec_id,
             CAST(sum(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << plane ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY 1)
         SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
         FROM sigs GROUP BY 1"""
  )
}
