package graft.operators

import graft.{DedupQueries, SparkTestBase}
import org.apache.spark.sql.functions._

/** The recall contract of the production hamming-LSH pairing
  * (q_dedup_simhash64_banded): 4 exact-match blocks of 16 bits guarantee —
  * by pigeonhole — that every pair at hamming ≤ 3 shares at least one whole
  * block, so the banded candidate set is a SUPERSET of the all-pairs result
  * at that radius. The fenced all-pairs query (doc_id < 150) is the oracle.
  */
class BandedSimHashSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Int]("hamming"))).toSet

  lazy val banded: Set[(Long, Long, Int)] = pairSet(
    DedupQueries.queries("q_dedup_simhash64_banded")(spark, dir)
      .filter(col("a_id") < 150 && col("b_id") < 150))

  lazy val allPairs: Set[(Long, Long, Int)] = pairSet(
    DedupQueries.queries("q_dedup_simhash64_pairs")(spark, dir))

  test("banded pairs are a superset of all-pairs at hamming <= 3 (pigeonhole)") {
    val low = allPairs.filter(_._3 <= 3)
    val missed = low diff banded
    assert(missed.isEmpty, s"banded pairing missed guaranteed pairs: $missed")
  }

  test("banded pairs never invent pairs absent from the all-pairs oracle") {
    // every banded pair within the bounded range must exist in the
    // all-pairs result with the same hamming distance (threshold 16 both)
    val extra = banded diff allPairs
    assert(extra.isEmpty, s"banded pairing fabricated pairs: $extra")
  }

  test("generalized banding: blocks=b guarantees recall at hamming <= b-1") {
    // the parameterized function must deliver the pigeonhole radius for
    // every supported block count — compare against the all-pairs oracle
    // on the bounded range, per radius
    val sh = DedupQueries.queries("q_dedup_simhash64_expr")(spark, dir)
      .filter(col("doc_id") < 150)
    for (blocks <- Seq(2, 8, 16, 32)) {
      val got = pairSet(
        DedupQueries.bandedSimhashPairs(sh, blocks, maxHamming = 64))
      val guaranteed = allPairs.filter(_._3 <= blocks - 1)
      val missed = guaranteed.filterNot(p => got.contains(p))
      assert(missed.isEmpty, s"blocks=$blocks missed guaranteed pairs: $missed")
      // and never fabricates: every emitted pair is a true pair (hamming
      // recomputed in plain Scala from the signatures)
      val sigs = sh.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("simhash_lo"), r.getAs[Long]("simhash_hi"))).toMap
      got.foreach { case (a, b, h) =>
        val ha = java.lang.Long.bitCount(sigs(a)._1 ^ sigs(b)._1) +
          java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2)
        assert(ha == h, s"blocks=$blocks pair ($a,$b): hamming $h != recomputed $ha")
      }
    }
  }

  test("banded candidate generation prunes vs all-pairs on the full corpus") {
    val sh = DedupQueries.queries("q_dedup_simhash64_expr")(spark, dir)
    val n = sh.count()
    val allPairCount = n * (n - 1) / 2
    // candidates actually compared = pairs sharing >= 1 of the 4 blocks
    val mask = lit(0xFFFFL)
    val bands = sh.select(col("doc_id"),
        explode(array(
          struct(lit(0).as("band"), col("simhash_lo").bitwiseAND(mask).as("key")),
          struct(lit(1).as("band"), shiftright(col("simhash_lo"), 16).bitwiseAND(mask).as("key")),
          struct(lit(2).as("band"), col("simhash_hi").bitwiseAND(mask).as("key")),
          struct(lit(3).as("band"), shiftright(col("simhash_hi"), 16).bitwiseAND(mask).as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    assert(cands * 10 < allPairCount,
      s"banding does not prune: candidates=$cands allPairs=$allPairCount")
  }
}
