package graft.validation

import graft.{SparkTestBase, ValidationQueries}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** FIXTURES.md §5 property: the salted two-stage uniqueness aggregate is
  * semantically identical to the plain single-stage groupBy on arbitrary
  * key multisets (the salt only reshapes the shuffle). Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge artifact isn't in
  * the offline cache).
  */
class UniquenessPropertySpec extends SparkTestBase {

  val keyMultisets: Gen[List[String]] = for {
    n <- Gen.choose(1, 120)
    keys <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0, 8).map(i => s"k$i"),         // hot, duplicate-prone keys
      Gen.alphaNumStr.map(s => "u" + s.take(6)))) // mostly-unique keys
  } yield keys

  test("salted two-stage uniqueness ≡ plain groupBy for arbitrary multisets") {
    import spark.implicits._
    val cases = (1 to 25).flatMap(i =>
      keyMultisets.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(cases.size >= 20)
    cases.foreach { keys =>
      val df = keys.zipWithIndex.toDF("k", "i")
      val salted = ValidationQueries
        .uniquenessVerdict(df, "prop", Seq("k"), saltBuckets = 4)
        .collect().head
      val plain = df.groupBy("k").count().collect()
      val nKeys = plain.length.toLong
      val dup = plain.filter(_.getLong(1) > 1)
      val nDup = dup.length.toLong
      val nExtra = dup.map(_.getLong(1) - 1).sum
      assert(salted.getAs[Long]("n_rows") == keys.size.toLong, keys)
      assert(salted.getAs[Long]("n_keys") == nKeys, keys)
      assert(salted.getAs[Long]("n_dup_keys") == nDup, keys)
      assert(salted.getAs[Long]("n_extra_rows") == nExtra, keys)
      assert(salted.getAs[Boolean]("pass") == (nDup == 0), keys)
    }
  }
}
