package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Inclusion-dependency discovery: planted FK graph recovered exactly,
  * near-misses (one orphan value) rejected, null values ignored, and
  * frequency skew in the raw data cannot create a hot value group
  * (cells are distinct per attribute).
  */
class InclusionSpec extends SparkTestBase {

  private def tables: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "dim" -> Seq(1L, 2L, 3L, 4L).toDF("k"),
      // fact.fk ⊆ dim.k (with heavy duplication — skew-safe by distinct)
      "fact" -> Seq.fill(50)(2L).appendedAll(Seq(1L, 3L)).toDF("fk"),
      // near.nk has orphan 99 → NOT contained in dim.k
      "near" -> Seq(1L, 2L, 99L).toDF("nk"),
      // nul.v: null values must be ignored, leaving {1,2} ⊆ dim.k
      "nul" -> Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("v"))
  }

  test("planted FK graph recovered, near-miss rejected, nulls ignored") {
    val t = tables
    val got = Inclusion.inds(t(_), Seq("dim" -> "k", "fact" -> "fk",
        "near" -> "nk", "nul" -> "v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("fact.fk", "dim.k")))
    assert(got.contains(("nul.v", "dim.k")), "nulls must not break containment")
    assert(!got.contains(("near.nk", "dim.k")), "orphan 99 must reject the IND")
    assert(!got.contains(("dim.k", "fact.fk")), "dim has values fact lacks")
    // subset chains: fact.fk = {1,2,3} ⊇ nul.v = {1,2}
    assert(got.contains(("nul.v", "fact.fk")))
    assert(got.contains(("near.nk", "near.nk")) == false)
  }

  test("testdata discovery finds the true TPC-H FK edges") {
    val got = graft.ValidationQueries.queries("q_v_inclusion")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the declared FK graph must be inside the discovered set
    val fks = Set(
      ("nation.n_regionkey", "region.r_regionkey"),
      ("customer.c_nationkey", "nation.n_nationkey"),
      ("supplier.s_nationkey", "nation.n_nationkey"),
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"))
    assert(fks.subsetOf(got),
      s"missing FK edges: ${fks -- got}")
    // and a known non-IND stays out: orders has orderkeys absent from lineitem?
    // (dense synthetic ranges make many ACCIDENTAL INDs valid — that is
    // correct discovery behavior at tiny scale, so only assert the
    // positive direction plus one guaranteed negative below)
    assert(!got.contains(("customer.c_custkey", "region.r_regionkey")),
      "1500 customers cannot fit in 5 regions")
  }
}
