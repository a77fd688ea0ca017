package graft.validation

import graft.SparkTestBase

/** Candidate-key discovery: planted keys found at both lattice levels,
  * pairs containing a level-1 key pruned (minimality), nulls counted
  * as values, all against plain-Scala recomputation.
  */
class UniqueCombosSpec extends SparkTestBase {

  test("planted UCCs found, supersets of keys pruned, evidence exact") {
    import spark.implicits._
    // id unique; (a,b) jointly unique though neither alone is; c never
    val df = Seq(
      (1L, "x", 10, "k"), (2L, "x", 20, "k"),
      (3L, "y", 10, "k"), (4L, "y", 20, "k")
    ).toDF("id", "a", "b", "c")
    val rows = UniqueCombos.uccs(df, Seq("id", "a", "b", "c")).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rows("id") == ((1, 4L, true)))
    assert(rows("a") == ((1, 2L, false)) && rows("b") == ((1, 2L, false)))
    assert(rows("a+b") == ((2, 4L, true)), "joint key at level 2")
    assert(rows("a+c") == ((2, 2L, false)) && rows("b+c") == ((2, 2L, false)))
    assert(!rows.contains("id+a") && !rows.contains("id+c"),
      "pairs containing a level-1 key are non-minimal and must be pruned")
  }

  test("null is a value for counting (sentinel projection)") {
    import spark.implicits._
    val df = Seq(
      (Option("u"), 1), (Option.empty[String], 2), (Option("v"), 3)
    ).toDF("k", "v")
    val rows = UniqueCombos.uccs(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    // with null-as-value, k has 3 distinct "values" and IS unique here
    assert(rows("k") && rows("v"))
  }
}
