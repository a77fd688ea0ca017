package graft.operators

import graft.{DedupQueries, SparkTestBase}

/** Large-star/small-star connected components (Kiveris et al., SoCC
  * 2014) vs min-id flooding: identical labels on planted and seeded
  * random graphs, O(log n) rounds on a chain whose diameter defeats a
  * round-bounded flooding, and graceful handling of the degenerate
  * shapes (empty graph, single edge, many singleton pairs).
  */
class StarCCSpec extends SparkTestBase {

  private def pairsDf(ps: Seq[(Long, Long)]) = {
    import spark.implicits._
    ps.toDF("a_id", "b_id")
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star equals flooding on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300) {
      val a = rnd.nextInt(100).toLong; val b = rnd.nextInt(100).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val df = pairsDf(edges)
    val flood = labels(DedupQueries.connectedComponents(df))
    val star = labels(DedupQueries.connectedComponentsStar(df))
    assert(star == flood, "star labels must equal flooding labels exactly")
  }

  test("chain of diameter 200: star converges where round-bounded flooding cannot") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val df = pairsDf(chain)
    // flooding needs O(diameter) rounds — at maxIters=8 it MUST refuse
    intercept[IllegalArgumentException] {
      DedupQueries.connectedComponents(df, maxIters = 8).collect()
    }
    // star contraction: strict convergence well inside 15 rounds
    val star = labels(DedupQueries.connectedComponentsStar(df, maxIters = 15))
    assert(star.keySet == (0L to 200L).toSet)
    assert(star.values.toSet == Set(0L), "one component rooted at the min id")
  }

  test("multiple components, single edge, and empty graph") {
    val df = pairsDf(Seq((10L, 20L), (20L, 30L), (5L, 7L), (100L, 101L)))
    val star = labels(DedupQueries.connectedComponentsStar(df))
    assert(star == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 7L -> 5L, 100L -> 100L, 101L -> 100L))
    assert(DedupQueries.connectedComponentsStar(pairsDf(Seq.empty)).count() == 0)
  }

  test("star components over the real banded pair graph match flooding") {
    val sh = DedupQueries.queries("q_dedup_simhash64_expr")(spark, "/root/testdata/sf0.001")
    val pairs = DedupQueries.bandedSimhashPairs(sh, blocks = 4, maxHamming = 16)
      .localCheckpoint()
    val flood = labels(DedupQueries.connectedComponents(pairs))
    val star = labels(DedupQueries.connectedComponentsStar(pairs))
    assert(star == flood)
  }
}
