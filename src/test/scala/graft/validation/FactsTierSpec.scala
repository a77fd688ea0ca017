package graft.validation

import graft.SparkTestBase

/** The persisted decoded-facts table lives at ONE fixed path (static
  * oracle SQL), so revisiting a tier after another tier overwrote the
  * parquet must rewrite it — the old (session, tier)-keyed written-set
  * skipped the rewrite and silently served the other tier's facts, and
  * the oracle (reading the same file) could not catch it.
  */
class FactsTierSpec extends SparkTestBase {

  test("revisiting a tier after a tier switch serves that tier's facts") {
    // rowsFor: sf0.0001 → 2000 (floor), sf0.0005 → 2500
    val a = ImageSuiteQueries.ensureFacts(spark, "/x/sf0.0001").count()
    val b = ImageSuiteQueries.ensureFacts(spark, "/x/sf0.0005").count()
    val a2 = ImageSuiteQueries.ensureFacts(spark, "/x/sf0.0001").count()
    assert(a == 2000L && b == 2500L)
    assert(a2 == a, s"stale facts after tier switch: got $a2 rows, expected $a")
  }

  test("image-table snapshot fingerprints flag exactly the rewritten partition") {
    val rows = ImageSuiteQueries.queries("q_i_snap_dirty")(spark, "/x/sf0.0005")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (part, status) = (r.getAs[String]("part"), r.getAs[String]("status"))
      val expect = if (part == "p3") "dirty" else "clean"
      assert(status == expect, s"$part: $status != $expect")
      // caption rewrite changes content, never cardinality
      assert(r.getAs[Long]("base_rows") == r.getAs[Long]("cur_rows"))
    }
  }
}
