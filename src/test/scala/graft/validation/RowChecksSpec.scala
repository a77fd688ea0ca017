package graft.validation

import graft.{SparkTestBase, Tables, ValidationQueries}
import org.apache.spark.sql.functions._

/** Row-level annotation / quarantine split and the mergeable-partials
  * path (the streaming twin's math): planted semantics, batch/split
  * consistency, and exact finalize-equals-single-pass equivalence.
  */
class RowChecksSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "OK"),
      (2L, Some(-3.0), "OK"),   // range violation
      (3L, None, "BAD"),        // completeness + set violations
      (4L, Some(5.0), "OK")
    ).toDF("id", "v", "status")
  }

  private val suite = CheckSuite(Seq(
    Complete("v", 1.0),
    InRange("v", 0.0, 100.0, 1.0),
    InSet("status", Seq("OK"), 1.0)))

  test("annotate emits declaration-ordered violation labels; null counts as violation") {
    val got = suite.annotate(fixture).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("violations"), r.getAs[Boolean]("row_pass")))
    assert(got(0) == ((1L, "", true)))
    assert(got(1) == ((2L, "range_v", false)))
    assert(got(2) == ((3L, "complete_v,range_v,inset_status", false)))
    assert(got(3) == ((4L, "", true)))
  }

  test("split routes every row exactly once and clean keeps the original schema") {
    val (clean, quarantine) = suite.split(fixture)
    assert(clean.columns.toSeq == fixture.columns.toSeq)
    assert(quarantine.columns.contains("violations"))
    assert(clean.count() + quarantine.count() == fixture.count())
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // quarantined rows each violate at least one row check
    assert(quarantine.filter(col("violations") === "").count() == 0)
  }

  test("annotated violation counts agree with the aggregate verdict metrics") {
    val li = Tables(spark, dir, "lineitem")
    val s = ValidationQueries.lineitemRowSuite
    val n = li.count().toDouble
    val metrics = s.run(li).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ann = s.annotate(li).cache()
    try s.rowChecks.foreach { c =>
      val viol = ann.filter(array_contains(split(col("violations"), ","), c.label)).count()
      val expect = BigDecimal(1.0 - viol / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(metrics(c.label) == expect, s"check ${c.label}")
    } finally ann.unpersist()
  }

  test("finalize over per-shard partials equals the single-pass run, exactly") {
    val li = Tables(spark, dir, "lineitem")
    val s = CheckSuite(Seq(
      Complete("l_shipdate", 1.0),
      InRange("l_quantity", 1.0, 45.0, 1.0),
      MeanBetween("l_extendedprice", 0.0, 100000.0),
      MinGte("l_discount", 0.0),
      MaxLte("l_tax", 0.2),
      SizeBetween(1L, 10000000L),
      Satisfies("low_discount", "l_discount <= 0.08", 0.9)))
    // 5 shards by key mod 4 — the fifth (k=4) is EMPTY by construction
    val shards = (0 to 4).map(k => li.filter(col("l_orderkey") % 4 === k))
    val partials = shards.map(s.partials).reduce(_ unionByName _)
    val got = s.finalizeFrom(partials).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val want = s.run(li).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("non-mergeable suites are rejected by partials/finalize") {
    val bad = CheckSuite(Seq(Unique(Seq("id"))))
    intercept[IllegalArgumentException] { bad.partials(fixture) }
  }
}
