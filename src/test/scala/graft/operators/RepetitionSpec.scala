package graft.operators

import graft.{RepetitionQueries, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins the Gopher repetition metrics and the substring-dedup coverage
  * union against hand-computed fixtures and an independent plain-Scala
  * recomputation (the DuckDB oracles pin the full corpus; these pin the
  * edge semantics: ties, short docs, overlapping duplicated spans).
  */
class RepetitionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("repetition metrics match hand-computed values incl. tie-break and short docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y x y x y"), // heavy 2/3-gram repetition
      (2L, "a b"),         // shorter than 3 tokens: top3/dup3 must be 0
      (3L, "a b c d")      // all grams distinct: dup3 = 0
    ).toDF("doc_id", "text")
    val got = RepetitionQueries.repetitionMetrics(spark, d)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))

    // doc 1 (nch=11): top 2-gram "x y" cnt 3, len 3 -> 9/11; 3-grams
    // "x y x" and "y x y" both cnt 2 -> tie broken by gram ASC -> "x y x"
    // len 5 -> 10/11; every 3-gram occurrence duplicated -> dup3 = 1.
    assert(got(0) == ((1L, 0.818182, 0.909091, 1.0, true)))
    // doc 2 (nch=3): single 2-gram "a b" -> 3/3; no 3-grams at all.
    assert(got(1) == ((2L, 1.0, 0.0, 0.0, true)))
    // doc 3 (nch=7): top 2-gram cnt 1 ("a b", len 3) -> 3/7; top 3-gram
    // cnt 1 ("a b c", len 5) -> 5/7; nothing duplicated.
    assert(got(2) == ((3L, 0.428571, 0.714286, 0.0, true)))
  }

  test("substring coverage union is exact for overlapping duplicated spans") {
    import spark.implicits._
    val w = (1 to 10).map(i => s"w$i")
    val d = Seq(
      (1L, w.mkString(" ")),          // 10 tokens: spans at pos 1,2,3
      (2L, w.take(9).mkString(" ")),  // 9 tokens: spans at pos 1,2
      (3L, (11 to 22).map(i => s"u$i").mkString(" ")) // unique: no dups
    ).toDF("doc_id", "text")
    val got = RepetitionQueries.substringDedup(d)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc 1: spans pos 1 (w1..w8) and pos 2 (w2..w9) are duplicated (both
    // appear in doc 2); pos 3 (w3..w10) is unique. Overlapping union
    // [1,8] U [2,9] = 9 tokens, NOT 16 — min(8, 2-1) + 8.
    assert(got(0) == ((1L, 10L, 2L, 9L, 0.9)))
    assert(got(1) == ((2L, 9L, 2L, 9L, 1.0)))
    assert(got(2) == ((3L, 12L, 0L, 0L, 0.0)))
  }

  test("substring dedup matches a plain-Scala recomputation on the real corpus") {
    val k = RepetitionQueries.SpanTokens
    val rows = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)

    // Independent recomputation: span strings counted globally, then
    // per-doc interval union over flagged positions.
    val spanCount = scala.collection.mutable.Map.empty[String, Int]
    val docSpans = rows.map { case (id, toks) =>
      val spans = (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
      spans.foreach(sp => spanCount(sp) = spanCount.getOrElse(sp, 0) + 1)
      id -> spans
    }
    val want = docSpans.map { case (id, spans) =>
      val flagged = spans.zipWithIndex.collect { case (sp, i) if spanCount(sp) >= 2 => i }
      val covered = flagged.zip(flagged.drop(1).map(Some(_)) :+ None)
        .map { case (p, nx) => math.min(k, nx.map(_ - p).getOrElse(k)) }.sum
      id -> ((flagged.size.toLong, covered.toLong))
    }.toMap

    val got = RepetitionQueries.substringDedup(Tables(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    assert(want.values.exists(_._1 > 0L), "fixture corpus must contain duplicated spans")
    want.foreach { case (id, v) => assert(got(id) == v, s"doc $id") }
  }

  test("repetition flags fire on the real corpus and metrics recompute exactly") {
    val rows = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

    def metrics(text: String): (Double, Double, Double) = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      def grams(n: Int) = (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      def top(n: Int): Double =
        if (toks.length < n) 0.0
        else {
          val c = grams(n).groupBy(identity).view.mapValues(_.size)
          val (g, cnt) = c.toSeq.minBy { case (g, cnt) => (-cnt, g) }
          BigDecimal(cnt.toLong * g.length / text.length.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      def dup(n: Int): Double =
        if (toks.length < n) 0.0
        else {
          val c = grams(n).groupBy(identity).view.mapValues(_.size).toSeq
          val tot = c.map { case (g, cnt) => cnt.toLong * g.length }.sum
          val dw = c.collect { case (g, cnt) if cnt >= 2 => cnt.toLong * g.length }.sum
          BigDecimal(dw / tot.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      (top(2), top(3), dup(3))
    }

    val want = rows.map { case (id, t) => id -> metrics(t) }.toMap
    val got = RepetitionQueries
      .repetitionMetrics(spark, Tables(spark, dir, "documents"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    assert(want.values.exists(_._3 > 0.0), "corpus must contain duplicated 3-grams")
    want.foreach { case (id, v) => assert(got(id) == v, s"doc $id") }
  }
}
