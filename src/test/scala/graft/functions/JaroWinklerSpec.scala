package graft.functions

import graft.SparkTestBase
import org.apache.spark.unsafe.types.UTF8String

/** The native jaro_winkler expression must reproduce the textbook
  * values and DuckDB's edge semantics, stay inside whole-stage codegen,
  * and its linkage rung must RECOVER the planted truncation pairs that
  * exact-equality scoring under-decides. */
class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel reproduces textbook values and DuckDB edge semantics") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB 1.0.0: empty-empty is 0, not 1
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // jaro("ab", "abzzzzzzzzzzzz") has m=2, jaro=(1 + 2/14 + 1)/3 ≈ 0.714
    // > 0.7 — pick a true sub-threshold case with a shared prefix
    val j = jw("aczzzzzzzz", "ab")
    assert(j < 0.7 && j > 0.0)
  }

  test("expression evaluates identically under codegen and matches kernel") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("Customer#000000001", "Customer#"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val got = df.select(JaroWinklerExpr.jaroWinkler(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).as[Double].collect()
    val want = Seq("MARTHA" -> "MARHTA", "DWAYNE" -> "DUANE",
      "Customer#000000001" -> "Customer#", "" -> "x", "same" -> "same")
      .map { case (a, b) => jw(a, b) }
    assert(got.toSeq == want)
    // real codegen, not fallback: over a non-local source (a local
    // relation constant-folds before planning) the projection must sit
    // inside a WholeStageCodegen span AND evaluate correctly there
    import org.apache.spark.sql.functions.{col, md5, substring}
    val rdf = spark.range(100).select(
      md5(col("id").cast("string")).as("a"),
      substring(md5((col("id") + 1).cast("string")), 1, 12).as("b"))
    val proj = rdf.select(col("a"), col("b"),
      JaroWinklerExpr.jaroWinkler(col("a"), col("b")).as("s"))
    // the `*(n)` marker is the WholeStageCodegen span in the simple
    // string form — the jaro_winkler projection must sit inside one
    val planStr = proj.queryExecution.executedPlan.toString
    assert(planStr.linesIterator.exists(l =>
      l.contains("*(") && l.contains("jaro_winkler")), planStr)
    val rows = proj.as[(String, String, Double)].collect()
    assert(rows.forall { case (a, b, s) => s == jw(a, b) })
  }

  test("JW linkage rung recovers planted typo pairs, all true") {
    import spark.implicits._
    val customer = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
    val pairs = graft.RecordLinkage.jwScorePairs(customer)
    val rec = pairs.filter("recovered")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(rec.nonEmpty, "no recovered pairs — threshold or plant broken")
    assert(rec.forall { case (a, b) => b - 1000000L == a },
      s"recovered a FALSE pair: ${rec.find { case (a, b) => b - 1000000L != a }}")
    // recovered pairs are exactly typo'd entity names: JW-agree, not
    // byte-equal, and the typo plant (custkey % 3 = 0) is the cause
    val chk = pairs.filter(
      "recovered AND (NOT name_eq OR name_eq = (jw_name = 1.0))").count()
    assert(chk == 0L)
    assert(rec.forall { case (a, _) => a % 3 == 0 },
      "recovered pair without a planted typo")
    // planted typo JW is the analytic 0.983333 (11/12 in-order matches
    // + full 4-char prefix boost)
    val tv = pairs.filter("recovered").select("jw_name")
      .as[Double].collect()
    assert(tv.forall(v => v == 0.983333),
      s"unexpected typo JW values: ${tv.distinct.toSeq}")
  }
}
