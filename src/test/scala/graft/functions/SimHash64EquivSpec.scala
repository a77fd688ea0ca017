package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The three SimHash-64 rungs (bits-join, builtin-HOF, native expression)
  * must agree bit-for-bit on arbitrary text — including unicode, repeated
  * and leading/trailing spaces — since all three claim the same oracle.
  * Raw ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache).
  */
class SimHash64EquivSpec extends SparkTestBase {

  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("héllo", "日本語", "naïve", "x", "0", "!?.,", "αβγ"))
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(12, wordGen)
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + words.mkString(" ") + pad

  /** Plain-Scala reference: same tokenization + md5-nibble bit rule. */
  private def reference(text: String): Option[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val w = new Array[Int](64)
      toks.foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        for (b <- 0 until 64) {
          val k = b >> 2
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          w(b) += (((nib >> (b & 3)) & 1) << 1) - 1
        }
      }
      var lo = 0L; var hi = 0L
      for (b <- 0 until 32) if (w(b) > 0) lo |= 1L << b
      for (b <- 32 until 64) if (w(b) > 0) hi |= 1L << (b - 32)
      Some((lo, hi))
    }
  }

  test("native expression == plain-Scala reference on arbitrary text") {
    import spark.implicits._
    val texts: Seq[String] = (1 to 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(17L + i))) ++
      Seq("", " ", "   ", "solo", " a  b ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), SimHash64Expr.simhash64(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1)).map(s => (s.getLong(0), s.getLong(1))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t), s"text=$t")
    }
  }

  test("all three query variants agree on the shared documents table") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.DedupQueries.queries("q_dedup_simhash64")(spark, dir).collect().toSeq
    val b = graft.DedupQueries.queries("q_dedup_simhash64_prod")(spark, dir).collect().toSeq
    val c = graft.DedupQueries.queries("q_dedup_simhash64_expr")(spark, dir).collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.map(_.toSeq) == c.map(_.toSeq))
  }
}
