package graft.validation

import graft.{SparkTestBase, Tables, ValidationQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The declarative check-suite API: per-check semantics on planted
  * fixtures, the one-scan compilation claim (plan-asserted), the
  * Expand-cost documentation for exact-distinct checks, and grouped
  * verdict equivalence. The DuckDB-generated oracle is hash-verified by
  * `q_v_checksuite`/`q_v_checksuite_grouped`; these tests pin the API
  * behaviors the oracle can't see.
  */
class ChecksSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), 10.0, "OK", "1-URGENT"),
      (2L, Some("b"), 20.0, "OK", "2-HIGH"),
      (3L, None, 30.0, "BAD", "nope"),
      (3L, Some("d"), -5.0, "OK", "3-LOW")
    ).toDF("id", "opt", "v", "status", "prio")
  }

  private def verdicts(df: DataFrame, suite: CheckSuite): Map[String, (Double, Boolean)] =
    suite.run(df).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

  test("each check type passes and fails on planted values") {
    val got = verdicts(fixture, CheckSuite(Seq(
      Complete("opt", 1.0),                      // 3/4 -> fail
      Complete("id", 1.0),                       // 4/4 -> pass
      Unique(Seq("id")),                         // 3 of 4 -> fail
      Unique(Seq("id", "opt")),                  // all tuples distinct -> pass
      InRange("v", 0.0, 100.0, 1.0),             // -5 out -> fail
      InSet("status", Seq("OK"), 0.75),          // 3/4 -> pass
      Matches("prio", "^[1-5]-", 1.0),           // "nope" -> fail
      MeanBetween("v", 10.0, 20.0),              // mean 13.75 -> pass
      QuantileBetween("v", 0.5, 0.0, 100.0),     // p50 = 15 -> pass
      MinGte("v", 0.0),                          // -5 -> fail
      MaxLte("v", 30.0),                         // 30 -> pass
      SizeBetween(1L, 10L),                      // 4 rows -> pass
      Satisfies("pos_or_bad", "v > 0 OR status = 'BAD'", 1.0)))) // row 4 fails

    assert(got("complete_opt") == ((0.75, false)))
    assert(got("complete_id") == ((1.0, true)))
    assert(got("unique_id") == ((0.75, false)))
    assert(got("unique_id_opt") == ((1.0, true)))
    assert(got("range_v") == ((0.75, false)))
    assert(got("inset_status") == ((0.75, true)))
    assert(got("matches_prio") == ((0.75, false)))
    assert(got("mean_v") == ((13.75, true)))
    assert(got("p50_v") == ((15.0, true)))
    assert(got("min_v") == ((-5.0, false)))
    assert(got("max_v") == ((30.0, true)))
    assert(got("size") == ((4.0, true)))
    assert(got("pos_or_bad") == ((0.75, false)))
  }

  test("a full suite compiles to ONE scan of the table") {
    val df = ValidationQueries.ordersSuite.run(Tables(spark, dir, "orders"))
    df.collect() // let AQE finalize
    // AdaptiveSparkPlan.toString prints final AND initial plans — count
    // scans in the final section only.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
  }

  test("Expand cost: absent without exact-distinct, present with two Unique checks") {
    val orders = Tables(spark, dir, "orders")
    val noDistinct = CheckSuite(Seq(
      Complete("o_custkey", 1.0), InRange("o_totalprice", 0, 1e6, 1.0),
      ApproxUnique("o_orderkey", 0.9))).run(orders)
    noDistinct.collect()
    assert(!noDistinct.queryExecution.executedPlan.toString.contains("Expand"),
      "algebraic-only suite must not plan an Expand")

    val oneDistinct = CheckSuite(Seq(
      Complete("o_custkey", 1.0), Unique(Seq("o_orderkey")))).run(orders)
    oneDistinct.collect()
    assert(!oneDistinct.queryExecution.executedPlan.toString.contains("Expand"),
      "a single exact-distinct is the two-stage rewrite, no Expand")

    val twoDistinct = CheckSuite(Seq(
      Unique(Seq("o_orderkey")), Unique(Seq("o_custkey")))).run(orders)
    twoDistinct.collect()
    assert(twoDistinct.queryExecution.executedPlan.toString.contains("Expand"),
      "two exact-distinct columns pay the Expand multiplier (documented cost)")
  }

  test("ApproxUnique tracks exact NDV within the sketch error") {
    val orders = Tables(spark, dir, "orders")
    val n = orders.count().toDouble
    val exact = orders.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0).toDouble
    val got = verdicts(orders, CheckSuite(Seq(ApproxUnique("o_custkey", 0.0, rsd = 0.02))))
    val approx = got("approx_unique_o_custkey")._1 * n
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"approx NDV $approx vs exact $exact drifted beyond 3x rsd")
  }

  test("grouped verdicts equal per-group global runs") {
    val orders = Tables(spark, dir, "orders")
    val suite = ValidationQueries.ordersSuiteGrouped
    val grouped = suite.run(orders, Seq("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    val statuses = orders.select("o_orderstatus").distinct().collect().map(_.getString(0))
    assert(statuses.nonEmpty)
    statuses.foreach { st =>
      val global = verdicts(orders.filter(col("o_orderstatus") === st), suite)
      global.foreach { case (check, mv) =>
        assert(grouped((st, check)) == mv, s"status $st check $check")
      }
    }
  }

  test("schemaReport verdicts on present, missing, and mistyped columns") {
    val got = CheckSuite.schemaReport(fixture, Seq(
        "id" -> "bigint", "v" -> "double", "v" -> "string", "ghost" -> "int"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got(("id", "bigint")) == (("bigint", true, true)))
    assert(got(("v", "double")) == (("double", true, true)))
    assert(got(("v", "string")) == (("double", true, false)))
    assert(got(("ghost", "int")) == (("", false, false)))
  }

  test("duplicate check labels are rejected at construction") {
    intercept[IllegalArgumentException] {
      CheckSuite(Seq(Complete("a", 1.0), Complete("a", 0.5)))
    }
  }
}
