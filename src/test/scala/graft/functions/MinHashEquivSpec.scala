package graft.functions

import graft.{DedupQueries, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The two MinHash rungs (builtin column math over exploded shingles, and
  * the native one-projection expression) must agree value-for-value on
  * arbitrary text — unicode, repeated/leading/trailing spaces, duplicate
  * shingles, under-3-token docs — since both claim the same DuckDB
  * oracle. Raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge artifact isn't in the offline cache).
  */
class MinHashEquivSpec extends SparkTestBase {

  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("héllo", "日本語", "naïve", "x", "0", "!?.,", "αβγ"))
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 14)
    words <- Gen.listOfN(n, wordGen)
    pad <- Gen.oneOf("", " ", "  ")
    dup <- Gen.oneOf(false, true) // duplicated tail → repeated shingles
  } yield pad + (if (dup) (words ++ words) else words).mkString(" ") + pad

  test("expression rung == column rung on arbitrary text") {
    import spark.implicits._
    val texts: Seq[String] = (1 to 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(23L + i))) ++
      Seq("", " ", "a b", "a b c", "a b c a b c", " a  b c ", "a a a a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def sigMap(sigs: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      sigs.collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = sigMap(DedupQueries.minhashSignatures(df, 16))
    val ex = sigMap(DedupQueries.minhashSignaturesExpr(df))
    assert(ex == hof, {
      val keys = (ex.keySet ++ hof.keySet).filter(k => ex.get(k) != hof.get(k))
      keys.map(k => s"doc $k text='${texts(k.toInt)}': expr=${ex.get(k)} hof=${hof.get(k)}")
        .mkString("; ")
    })
    // docs with < 3 tokens appear in NEITHER rung
    assert(!ex.keySet.exists(k => texts(k.toInt).split(" ", -1).length < 3))
  }

  test("both rungs agree on the shared documents table") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.Tables(spark, dir, "documents")
    val a = DedupQueries.minhashSignatures(d, 16).orderBy("doc_id").collect().toSeq
    val b = DedupQueries.minhashSignaturesExpr(d).orderBy("doc_id").collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
