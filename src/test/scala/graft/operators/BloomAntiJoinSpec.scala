package graft.operators

import graft.{BloomAntiJoin, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Exactness + split-behavior of the Bloom-accelerated anti-join. */
class BloomAntiJoinSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // orders with no lineitem rows — the fixture's real-orphans direction
  private def plainAnti = {
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_orderstatus")
    val l = Tables(spark, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
  }

  test("bloom anti-join equals the plain anti-join (set-exact)") {
    val got = BloomAntiJoin.antiJoin(
      Tables(spark, dir, "orders").select("o_orderkey", "o_orderstatus"),
      Tables(spark, dir, "lineitem"), "o_orderkey", "l_orderkey",
      expectedItems = 20000L, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = plainAnti.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(want.nonEmpty, "fixture must have real orphans")
    assert(got == want)
  }

  test("result stays exact even when the filter is saturated (FPP ~ 1)") {
    // 64 bits for thousands of keys: nearly every probe is a false
    // positive, so nearly everything routes through the exact join —
    // the result must not change.
    val got = BloomAntiJoin.antiJoin(
      Tables(spark, dir, "orders").select("o_orderkey", "o_orderstatus"),
      Tables(spark, dir, "lineitem"), "o_orderkey", "l_orderkey",
      expectedItems = 1L, fpp = 0.99)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = plainAnti.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("new-vs-seen shape: most of the probe bypasses the join shuffle") {
    // the shuffle-savings claim, measured on the q_dedup_incr_bloom
    // shape: the seen-store holds ~1/8 of the corpus, so ~87% of probe
    // keys are definite-absent; at 1% FPP the bypass must stay > 70%
    val d = Tables(spark, dir, "documents")
    val seen = d.filter(
      substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .select(col("doc_id").as("seen_id"))
    val n = d.count()
    val filter = BloomAntiJoin.buildFilter(seen, col("seen_id"), 20000L, 200000L)
    val bypass = n - d.filter(BloomAntiJoin.mightContain(
      filter, col("doc_id"))).count()
    assert(bypass > (n * 7) / 10, s"expected >70% definite-absent, got $bypass/$n")
  }
}
