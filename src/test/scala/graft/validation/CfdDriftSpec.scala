package graft.validation

import graft.SparkTestBase
import graft.images.ImageGen
import org.apache.spark.sql.functions._

/** The conditional-FD tableau and the derived-fact segmented drift:
  * cfd() against a constructed table with known pattern structure, then
  * both q_i rungs against the generator's planted ground truth. */
class CfdDriftSpec extends SparkTestBase {

  import spark.implicits._

  test("cfd tableau: exact, approximate, and below-support patterns") {
    val rows =
      Seq.fill(100)(("A", "X")) ++
        (Seq.fill(57)(("B", "X")) ++ Seq.fill(3)(("B", "Y"))) ++
        Seq.fill(10)(("C", "Z"))
    val out = FunctionalDeps.cfd(rows.toDF("det", "dep"), "det", "dep",
      minSupport = 20L, minConf = 0.95).collect()
    val byDet = out.map(r => r.getAs[String]("det_value") -> r).toMap
    assert(byDet.keySet == Set("A", "B"), s"support gate failed: ${byDet.keySet}")
    assert(byDet("A").getAs[Boolean]("exact") && byDet("A").getAs[Boolean]("holds"))
    assert(byDet("A").getAs[Double]("confidence") == 1.0)
    assert(!byDet("B").getAs[Boolean]("exact"))
    assert(byDet("B").getAs[Double]("confidence") == 0.95 &&
      byDet("B").getAs[Boolean]("holds"))
    assert(byDet("B").getAs[String]("top_dep") == "X")
    assert(byDet("B").getAs[Long]("ndv_dep") == 2L)
  }

  test("cfd dominant pick is tie-broken by value, deterministically") {
    val rows = Seq.fill(30)(("A", "X")) ++ Seq.fill(30)(("A", "Y"))
    val out = FunctionalDeps.cfd(rows.toDF("det", "dep"), "det", "dep", 1L, 0.9)
      .collect()
    assert(out.length == 1 && out(0).getAs[String]("top_dep") == "Y")
    assert(out(0).getAs[Double]("confidence") == 0.5)
  }

  test("fmt → container_kind tableau on the corpus: every tag holds, none vacuously") {
    val out = ImageSuiteQueries.queries("q_i_cfd")(spark, "/x/sf0.0005").collect()
    val byDet = out.map(r => r.getAs[String]("det_value") -> r).toMap
    assert(Set("jpeg", "png", "bmp").subsetOf(byDet.keySet), s"${byDet.keySet}")
    byDet.foreach { case (k, r) =>
      assert(r.getAs[Boolean]("holds"), s"$k: ${r.getAs[Double]("confidence")}")
    }
    // jpeg has the support for the planted pollution (nulls, corrupt,
    // swapped encodes) to show: the FD must be conditional, not exact
    assert(!byDet("jpeg").getAs[Boolean]("exact"))
    assert(byDet("jpeg").getAs[Double]("confidence") > 0.9)
  }

  test("segmented sharpness drift flags exactly the planted big-dim parts") {
    val out = ImageSuiteQueries.queries("q_i_drift_sharpness")(
      spark, "/x/sf0.0005").collect()
    assert(out.nonEmpty)
    val drifted = ImageGen.DriftedParts.map("p" + _).toSet
    out.foreach { r =>
      assert(r.getAs[Boolean]("drifted") == drifted(r.getAs[String]("segment")),
        s"${r.getAs[String]("segment")}: chi2=${r.getAs[Double]("chi2")}")
    }
  }
}
