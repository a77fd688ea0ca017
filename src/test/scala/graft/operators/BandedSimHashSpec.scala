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
    // on the bounded range, per radius. The oracle only emits pairs with
    // hamming <= 16, so for blocks > 16 this check is capped at radius 16;
    // the synthetic test below covers the radii beyond the oracle's range.
    val sh = DedupQueries.queries("q_dedup_simhash64_expr")(spark, dir)
      .filter(col("doc_id") < 150)
    val sigs = sh.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("simhash_lo"), r.getAs[Long]("simhash_hi"))).toMap
    for (blocks <- Seq(2, 4, 8, 16, 32)) {
      val got = pairSet(
        DedupQueries.bandedSimhashPairs(sh, blocks, maxHamming = 64))
      val guaranteed = allPairs.filter(_._3 <= blocks - 1)
      val missed = guaranteed.filterNot(p => got.contains(p))
      assert(missed.isEmpty, s"blocks=$blocks missed guaranteed pairs: $missed")
      // and never fabricates: every emitted pair is a true pair (hamming
      // recomputed in plain Scala from the signatures)
      got.foreach { case (a, b, h) =>
        val ha = java.lang.Long.bitCount(sigs(a)._1 ^ sigs(b)._1) +
          java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2)
        assert(ha == h, s"blocks=$blocks pair ($a,$b): hamming $h != recomputed $ha")
      }
    }
  }

  test("high-radius pigeonhole on adversarial synthetic signatures") {
    // worst-case pairs the real-corpus oracle cannot reach (it caps at
    // hamming 16): flip exactly blocks-1 bits spread over blocks-1
    // DISTINCT bands, leaving exactly one band clean — the hardest input
    // that still must be recalled. Built directly over the (lo, hi)
    // signature layout (bits 0..31 / 32..63).
    import spark.implicits._
    def sig(bits: Set[Int]): (Long, Long) = (
      bits.filter(_ < 32).map(b => 1L << b).fold(0L)(_ | _),
      bits.filter(_ >= 32).map(b => 1L << (b - 32)).fold(0L)(_ | _))
    for (blocks <- Seq(4, 8, 16, 32)) {
      val w = 64 / blocks
      // doc 0: all-zero signature; doc 1: one bit flipped in each of the
      // first blocks-1 bands (hamming = blocks-1, exactly one clean band)
      val flipped = (0 until blocks - 1).map(j => j * w).toSet
      val (lo1, hi1) = sig(flipped)
      val df = Seq((0L, 0L, 0L), (1L, lo1, hi1))
        .toDF("doc_id", "simhash_lo", "simhash_hi")
      val got = pairSet(DedupQueries.bandedSimhashPairs(df, blocks, maxHamming = 64))
      assert(got == Set((0L, 1L, blocks - 1)),
        s"blocks=$blocks: expected the hamming-${blocks - 1} pair, got $got")
      // one more flip lands in the last clean band — the pigeonhole
      // guarantee ends, and for THIS adversarial layout no band matches,
      // so the pair must disappear (proves the test really exercises the
      // band boundary, not some wider net)
      val (lo2, hi2) = sig(flipped + ((blocks - 1) * w))
      val df2 = Seq((0L, 0L, 0L), (1L, lo2, hi2))
        .toDF("doc_id", "simhash_lo", "simhash_hi")
      val got2 = pairSet(DedupQueries.bandedSimhashPairs(df2, blocks, maxHamming = 64))
      assert(got2.isEmpty,
        s"blocks=$blocks: pair with all $blocks bands dirty should not be a candidate, got $got2")
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
