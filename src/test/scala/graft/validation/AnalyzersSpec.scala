package graft.validation

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Identity-based checks for the relationship analyzers: MI's two
  * analytic extremes (determined ⇒ MI = H, independent ⇒ MI = 0),
  * exact inversion counting with planted violations, and the three
  * cardinality classes on frames constructed to be exactly 1:1, N:1
  * and N:M. */
class AnalyzersSpec extends SparkTestBase {

  private lazy val sp = spark
  import sp.implicits._

  test("mutual information: y determined by x gives MI = H(x), mi_norm = 1") {
    // 4 categories with skewed counts 1/2/3/4; y is a pure function of x
    val rows = (1 to 4).flatMap(i => Seq.fill(i)((s"x$i", s"y$i")))
    val df = rows.toDF("x", "y")
    val r = Analyzers.mutualInfo(df, "x", "y").collect().head
    val (hx, hy, hxy, mi, miNorm) = (r.getDouble(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(r.getLong(0) == 10L)                 // n
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(math.abs(hx - hy) < 1e-9)            // same distribution
    assert(math.abs(hxy - hx) < 1e-9)           // joint carries no extra info
    assert(math.abs(mi - hx) < 1e-9)            // MI = H(x)
    assert(math.abs(miNorm - 1.0) < 1e-9)
  }

  test("mutual information: independent columns give MI = 0") {
    // full cross product with equal counts — exactly independent
    val rows = for (x <- 1 to 3; y <- 1 to 4; _ <- 1 to 2)
      yield (s"x$x", s"y$y")
    val r = Analyzers.mutualInfo(rows.toDF("x", "y"), "x", "y").collect().head
    assert(r.getLong(3) == 12L)                 // ndv_xy = 3*4
    assert(math.abs(r.getDouble(7)) < 1e-9)     // mi
    assert(math.abs(r.getDouble(8)) < 1e-9)     // mi_norm
  }

  test("order invariant: planted inversions are counted exactly") {
    // key A sorted (3 pairs, clean), key B has 2 inversions in ord
    // order: values 5,1,4,2 → (5>1), (4>2); key C single row (no pair)
    val df = Seq(
      ("A", 1L, 10.0), ("A", 2L, 10.0), ("A", 3L, 11.0), ("A", 4L, 12.0),
      ("B", 1L, 5.0), ("B", 2L, 1.0), ("B", 3L, 4.0), ("B", 4L, 2.0),
      ("C", 1L, 7.0)
    ).toDF("k", "o", "v")
    val r = Analyzers.orderInvariant(df, "k", "o", "v").collect().head
    assert(r == Row(3L, 6L, 2L, false))
    val clean = Analyzers.orderInvariant(df.filter($"k" === "A"), "k", "o", "v")
      .collect().head
    assert(clean == Row(1L, 3L, 0L, true))      // verdict emitted when clean
  }

  test("relationship cardinality: 1:1, N:1 and N:M classify correctly") {
    val parent = Seq((1, "p"), (2, "p"), (3, "p")).toDF("pk", "pad")
    val oneToOne = Seq((1, "c"), (2, "c"), (3, "c")).toDF("ck", "pad")
    val nToOne = Seq((1, "c"), (1, "c"), (2, "c"), (3, "c")).toDF("ck", "pad")
    val dupParent = Seq((1, "p"), (1, "p"), (2, "p")).toDF("pk", "pad")
    def classify(child: org.apache.spark.sql.DataFrame,
                 par: org.apache.spark.sql.DataFrame) =
      Analyzers.relationshipCardinality("e", child, "ck", par, "pk")
        .select("cardinality", "max_child_mult", "max_parent_mult")
        .collect().head
    assert(classify(oneToOne, parent) == Row("1:1", 1L, 1L))
    assert(classify(nToOne, parent) == Row("N:1", 2L, 1L))
    assert(classify(nToOne, dupParent) == Row("N:M", 2L, 2L))
  }
}
