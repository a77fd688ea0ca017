package graft

import org.apache.spark.sql.functions._

/** [[SetSimilarity]] vs independent plain-Scala recomputation: both
  * exact-similarity joins must equal their ALL-PAIRS ground truth
  * exactly — the candidate filters are supposed to be lossless
  * (AllPairs prefix lemma, PassJoin pigeonhole), so any missing pair is
  * a correctness bug, not a tuning issue. */
class SetSimilaritySpec extends SparkTestBase {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---------------- plain-Scala ground truths ----------------

  private def shingleSet(text: String): Set[String] = {
    val ts = text.split(" ", -1)
    if (ts.length < 3) Set.empty
    else (0 to ts.length - 3).map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toSet
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  // ---------------- prefix-filtered Jaccard ----------------

  test("prefix Jaccard join equals all-pairs ground truth on testdata") {
    val docs = Tables(spark, sfDir, "documents")
    val t = 0.5
    val got = SetSimilarity.prefixJaccardPairs(docs, t)
      .select("a_id", "b_id", "common", "a_sz", "b_sz")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null).map { case (id, tx) => (id, shingleSet(tx)) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (ai, as) <- local; (bi, bs) <- local if ai < bi
      c = (as & bs).size
      u = as.size + bs.size - c
      if u > 0 && c.toDouble / u >= t
    } yield (ai, bi, c.toLong, as.size.toLong, bs.size.toLong)).toSet

    assert(want.nonEmpty, "testdata should contain near-dup shingle pairs")
    assert(got === want)
  }

  test("prefix filter actually prunes below all-pairs") {
    val docs = Tables(spark, sfDir, "documents")
    val n = docs.filter(col("text").isNotNull).count()
    val allPairs = n * (n - 1) / 2
    val cands = SetSimilarity.prefixJaccardCandidates(docs, t = 0.5).count()
    assert(cands < allPairs / 2,
      s"prefix filter should prune: $cands candidates vs $allPairs all-pairs")
  }

  test("prefix Jaccard handles planted boundary and identical docs") {
    // J exactly at threshold, just below it, and identical docs.
    val rows = Seq(
      (1L, "a b c d e f"),     // shingles {abc,bcd,cde,def} (4)
      (2L, "a b c d e f"),     // identical → J = 1.0
      (3L, "a b c d e x"),     // {abc,bcd,cde,dex} → inter 3, union 5 → 0.6
      (4L, "z y x w v u"),     // disjoint
      (5L, "a b"),             // < 3 tokens → no shingles, excluded
      (6L, "p q r s"),         // {pqr,qrs}
      (7L, "p q r t")          // {pqr,qrt} → inter 1, union 3 → 1/3 < 0.5
    ).toDF("doc_id", "text")
    val got = SetSimilarity.prefixJaccardPairs(rows, t = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("no cartesian product in the prefix-join plan") {
    val docs = Tables(spark, sfDir, "documents")
    val plan = SetSimilarity.prefixJaccardPairs(docs, t = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  // ---------------- PassJoin edit distance ----------------

  test("PassJoin equals all-pairs levenshtein ground truth on testdata") {
    val corpus = SetSimilarity.editCorpus(Tables(spark, sfDir, "documents"))
    val k = 2
    val got = SetSimilarity.passJoinEditPairs(corpus, k)
      .as[(Long, Long, Int)].collect().toSet

    val local = corpus.as[(Long, String)].collect()
    val want = (for {
      (ai, ac) <- local; (bi, bc) <- local
      if ai < bi && math.abs(ac.length - bc.length) <= k
      d = levenshtein(ac, bc) if d <= k
    } yield (ai, bi, d)).toSet

    assert(want.nonEmpty, "planted variants must produce pairs")
    assert(want.exists(_._3 == 2), "a distance-2 pair must exist (k boundary)")
    assert(got === want)
  }

  test("PassJoin candidates prune below all-pairs") {
    val corpus = SetSimilarity.editCorpus(Tables(spark, sfDir, "documents"))
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    val cands = SetSimilarity.passJoinCandidates(corpus, k = 2).count()
    assert(cands < allPairs / 2,
      s"segment keys should prune: $cands candidates vs $allPairs all-pairs")
  }

  test("PassJoin exact on planted short strings incl. uneven segmentation") {
    // lengths not divisible by k+1, distance exactly k, distance k+1
    // (must be excluded), and a length-gap > k pair (excluded).
    val rows = Seq(
      (1L, "abcdefghij"),   // len 10
      (2L, "abcdefghix"),   // sub at end → d=1
      (3L, "abcdefgh"),     // 2 deletes → d=2
      (4L, "abcdefg"),      // 3 deletes from 1 → d=3 (out)
      (5L, "zzzzzzzzzz"),   // same length, all different (out)
      (6L, "abc"),          // tiny, far (out vs all)
      (7L, "abd")           // d(6,7)=1
    ).toDF("id", "cap")
    val got = SetSimilarity.passJoinEditPairs(rows, k = 2)
      .as[(Long, Long, Int)].collect().toSet
    val local = rows.as[(Long, String)].collect()
    val want = (for {
      (ai, ac) <- local; (bi, bc) <- local if ai < bi
      d = levenshtein(ac, bc) if d <= 2
    } yield (ai, bi, d)).toSet
    assert(want === Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 2), (3L, 4L, 1),
      (6L, 7L, 1))) // pin the ground truth itself so the test can't go vacuous
    assert(got === want)
  }

  test("no cartesian product in the PassJoin plan") {
    val corpus = SetSimilarity.editCorpus(Tables(spark, sfDir, "documents"))
    val plan = SetSimilarity.passJoinEditPairs(corpus, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
