package graft.validation

import graft.SparkTestBase

/** Functional-dependency discovery: planted FDs recovered exactly
  * against an independent plain-Scala recomputation, nulls break
  * agreement like any other value, and a one-row-off near-miss is
  * rejected.
  */
class FunctionalDepsSpec extends SparkTestBase {

  test("planted FDs recovered; near-miss and null-split rejected") {
    import spark.implicits._
    // id → all (key); brand → mfgr (planted, e.g. TPC-H brand digits);
    // brandX → mfgr BROKEN by one row; nully → grp broken by a null
    // appearing alongside a real value under the same nully
    val df = Seq(
      (1L, "B11", "M1", "B11", Option("a")),
      (2L, "B12", "M1", "B12", Option("a")),
      (3L, "B21", "M2", "B21", Option.empty[String]),
      (4L, "B21", "M2", "B21x", Option("a")),
      (5L, "B12", "M1", "B12", Option.empty[String])
    ).toDF("id", "brand", "mfgr", "brandx", "nully")
    // brandx near-miss: value B21 maps to M2 but B21x also maps to M2;
    // the broken direction is mfgr→brandx (M2 → {B21, B21x})
    val cols = Seq("id", "brand", "mfgr", "brandx", "nully")
    val got = FunctionalDeps.fds(df, cols).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getBoolean(4))).toMap

    // independent recomputation: group rows by det value (null = mark)
    val rows = df.collect().map(r => cols.map(c =>
      Option(r.getAs[Any](c)).map(_.toString).getOrElse(FunctionalDeps.NullMark)))
    for (d <- cols.indices; p <- cols.indices if d != p) {
      val holds = rows.groupBy(_(d)).values
        .forall(g => g.map(_(p)).distinct.size == 1)
      assert(got((cols(d), cols(p))) == holds,
        s"${cols(d)} -> ${cols(p)}: got ${got((cols(d), cols(p)))}, want $holds")
    }
    // the named cases, spelled out
    assert(got(("id", "brand")) && got(("id", "nully")), "key determines all")
    assert(got(("brand", "mfgr")), "planted FD")
    assert(got(("brandx", "mfgr")), "fine-grained det still holds")
    assert(!got(("mfgr", "brandx")), "M2 maps to two brandx values")
    assert(!got(("nully", "id")), "null group holds ids 3 and 5")
  }

  test("evidence columns: det_ndv and max_dep_ndv are exact") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 3)).toDF("k", "v")
    val rows = FunctionalDeps.fds(df, Seq("k", "v")).collect()
    // k: groups a→{1,2}, b→{3}, c→{3} — 3 det values, worst group 2 deps
    val kv = rows.find(r => r.getString(0) == "k").get
    assert(kv.getLong(2) == 3 && kv.getLong(3) == 2 && !kv.getBoolean(4))
    // v: groups 1→{a}, 2→{a}, 3→{b,c} — v=3 splits, so v→k fails too
    val vk = rows.find(r => r.getString(0) == "v").get
    assert(vk.getLong(2) == 3 && vk.getLong(3) == 2 && !vk.getBoolean(4))
  }
}
