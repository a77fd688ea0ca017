package graft.operators

import graft.{SimilarityQueries, SparkTestBase}
import graft.images.ImageCodec
import org.apache.spark.sql.functions._

/** The scale claim behind the LSH ANN path, evidenced on data with real
  * cluster structure: the synthetic `embeddings` table is isotropic random
  * (the LSH worst case — recall 0.9 needs a wide candidate net there), but
  * on clustered embeddings a TIGHT net (few tables × many planes) returns
  * near-perfect within-cluster recall while examining orders of magnitude
  * fewer pairs than brute force. This is the regime 100 TB corpora are in.
  */
class AnnClusteredSpec extends SparkTestBase {

  val Clusters = 40
  val PerCluster = 20
  val Dims = 32
  val Tables = 4
  val Planes = 12

  /** Deterministic clustered vectors: unit cluster centers + small noise. */
  private def vec(cluster: Int, member: Int): Array[Double] = {
    def u(seed: Long): Double =
      (ImageCodec.mix64(seed) >>> 11) * (1.0 / (1L << 53)) - 0.5
    val center = Array.tabulate(Dims)(d => u(cluster * 1009L + d))
    val cn = math.sqrt(center.map(x => x * x).sum)
    val noisy = Array.tabulate(Dims)(d =>
      center(d) / cn + 0.08 * u(cluster * 7919L + member * 131L + d))
    val n = math.sqrt(noisy.map(x => x * x).sum)
    noisy.map(_ / n)
  }

  // hyperplanes precomputed once (signBits runs per vector × table)
  private lazy val planesArr: Array[Array[Double]] =
    Array.tabulate(Tables * Planes)(i => SimilarityQueries.hyperplane(i, Dims))

  private def signBits(v: Array[Double], t: Int): Long =
    (0 until Planes).map { p =>
      val w = planesArr(t * Planes + p)
      val dot = (0 until Dims).map(d => v(d) * w(d)).sum
      if (dot > 0) 1L << p else 0L
    }.sum

  lazy val vectors: Seq[(Long, Int, Array[Double])] =
    for (c <- 0 until Clusters; m <- 0 until PerCluster)
      yield ((c * PerCluster + m).toLong, c, vec(c, m))

  lazy val candidatePairs: Set[(Long, Long)] = {
    val byBucket = (0 until Tables).flatMap { t =>
      vectors.groupBy { case (_, _, v) => signBits(v, t) }.values
        .flatMap { grp =>
          for (a <- grp; b <- grp if a._1 < b._1) yield (a._1, b._1)
        }
    }
    byBucket.toSet
  }

  test("tight LSH net prunes candidates by >10x vs all-pairs on clustered data") {
    val n = vectors.size
    val allPairs = n.toLong * (n - 1) / 2
    assert(candidatePairs.size.toLong * 10 < allPairs,
      s"candidates=${candidatePairs.size} vs allPairs=$allPairs")
  }

  test("trained IVF achieves recall@3 >= 0.9 vs brute force on clustered data") {
    // member-major ids so the 16 seed cells (vec_id < 16) span 16 distinct
    // clusters — the regime the coarse quantizer is for. label = cluster id;
    // cluster-0 members are the label-0 query set.
    val rows = for (m <- 0 until PerCluster; c <- 0 until Clusters)
      yield ((m * Clusters + c).toLong, c, vec(c, m).map(_.toFloat))
    val df = spark.createDataFrame(rows).toDF("vec_id", "label", "embedding")
    val got = SimilarityQueries.ivfTrainedTopK(df, probeCells = 2, k = 3)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val byId = rows.map(r => r._1 -> r._3.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = (0 until Dims).map(d => a(d) * b(d)).sum
      dp / math.sqrt((0 until Dims).map(d => a(d) * a(d)).sum *
        (0 until Dims).map(d => b(d) * b(d)).sum)
    }
    val queries = rows.filter(_._2 == 0).map(_._1)
    var totalRecall = 0.0
    queries.foreach { q =>
      val bf = byId.toSeq.filter(_._1 != q)
        .map { case (id, v) => (cos(byId(q), v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(3).map(_._2).toSet
      totalRecall += (bf intersect got.getOrElse(q, Set.empty)).size / 3.0
    }
    val recall = totalRecall / queries.size
    assert(recall >= 0.9, s"trained IVF clustered recall@3 = $recall")
  }

  test("IVF recall@3 is monotone in probe count and >= 0.9 at probe 2") {
    // the accuracy/cost dial of the inverted-file probe: more probed cells
    // → strictly more candidates → recall can only rise; 2 of 16 cells
    // already clear 0.9 on clustered data (the 10^9-vector operating
    // point). Trained with the production 3 Lloyd's steps.
    val rows = for (m <- 0 until PerCluster; c <- 0 until Clusters)
      yield ((m * Clusters + c).toLong, c, vec(c, m).map(_.toFloat))
    val df = spark.createDataFrame(rows).toDF("vec_id", "label", "embedding")
    val byId = rows.map(r => r._1 -> r._3.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = (0 until Dims).map(d => a(d) * b(d)).sum
      dp / math.sqrt((0 until Dims).map(d => a(d) * a(d)).sum *
        (0 until Dims).map(d => b(d) * b(d)).sum)
    }
    val queries = rows.filter(_._2 == 0).map(_._1)
    val bfTop: Map[Long, Set[Long]] = queries.map { q =>
      q -> byId.toSeq.filter(_._1 != q)
        .map { case (id, v) => (cos(byId(q), v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(3).map(_._2).toSet
    }.toMap
    val recalls = Seq(1, 2, 4).map { probes =>
      val got = SimilarityQueries.ivfTrainedTopK(df, probeCells = probes, k = 3)
        .collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
      probes -> queries.map(q =>
        (bfTop(q) intersect got.getOrElse(q, Set.empty)).size / 3.0)
        .sum / queries.size
    }
    info(s"recall@3 by probes: ${recalls.map { case (p, r) => f"$p->$r%.3f" }.mkString(", ")}")
    recalls.sliding(2).foreach { case Seq((pl, rl), (ph, rh)) =>
      assert(rh >= rl - 1e-9, s"recall fell from $rl (probes=$pl) to $rh (probes=$ph)")
    }
    val r2 = recalls.find(_._1 == 2).get._2
    assert(r2 >= 0.9, s"recall@3 at probe 2 = $r2")
  }

  test("within-cluster nearest neighbors survive the pruning (recall >= 0.9)") {
    // true top-1 per vector is (by construction) a same-cluster member;
    // compute it exactly, then check the candidate set contains the pair
    val byId = vectors.map(v => v._1 -> v).toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      (0 until Dims).map(d => a(d) * b(d)).sum
    var hits = 0; var total = 0
    vectors.foreach { case (id, c, v) =>
      val top1 = vectors.filter(_._1 != id)
        .maxBy { case (oid, _, ov) => (cos(v, ov), -oid.toDouble) }
      if (top1._2 == c) { // only score queries whose true NN is in-cluster
        total += 1
        val pair = if (id < top1._1) (id, top1._1) else (top1._1, id)
        if (candidatePairs.contains(pair)) hits += 1
      }
    }
    assert(total > Clusters * PerCluster / 2, s"degenerate clustering: total=$total")
    val recall = hits.toDouble / total
    assert(recall >= 0.9, s"clustered recall@1 = $recall ($hits/$total)")
  }
}
