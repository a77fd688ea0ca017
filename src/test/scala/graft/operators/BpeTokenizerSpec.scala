package graft.operators

import graft.{BpeTokenizer, SparkTestBase}
import org.apache.spark.sql.functions._

/** BPE tokenizer vs an independent plain-Scala recomputation: training
  * (pair counts, argmax tie-breaks, greedy left-to-right merges) and the
  * regexp-based encode are both pinned against a reference fold.
  */
class BpeTokenizerSpec extends SparkTestBase {

  // --- independent plain-Scala BPE (the spec's own oracle) ---

  private def words(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Greedy left-to-right merge of one (a, b) pair in a symbol list. */
  private def mergeOnce(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def train(corpus: Seq[String], k: Int): Seq[(String, String)] = {
    var freq: Map[List[String], Long] = corpus.flatMap(words)
      .groupBy(identity).map { case (w, xs) =>
        w.split("").toList -> xs.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to k) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      freq.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + f)
      }
      if (pairs.nonEmpty) {
        val (a, b) = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        freq = freq.map { case (syms, f) => mergeOnce(syms, a, b) -> f }
      }
    }
    merges.toSeq
  }

  private def encodeCount(text: String, merges: Seq[(String, String)]): Long =
    words(text).map { w =>
      merges.foldLeft(w.split("").toList) { case (s, (a, b)) => mergeOnce(s, a, b) }
        .length.toLong
    }.sum

  // --- corpus with designed collisions: repeated pairs, "aaa" runs, ties ---
  private val corpus = Seq(
    "the cat sat on the mat the cat",
    "aaa aa a abab ab ab",
    "scan scan scan table table row",
    "erer er ererer",
    "zz zz zz yy yy xx")

  test("trained merges match the plain-Scala recomputation") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTokenizer.train(df, k = 8)
    val want = train(corpus, 8)
    assert(got == want, s"merges diverged:\n got=$got\nwant=$want")
  }

  test("regexp encode == fold encode == plain-Scala on every doc") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = train(corpus, 8)
    val got = df.select(col("doc_id"),
        BpeTokenizer.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == encodeCount(t, merges),
        s"doc $i: got ${got(i.toLong)}, want ${encodeCount(t, merges)} for '$t'")
    }
  }

  test("mergePass fold equals regexp pass on adversarial symbol runs") {
    import spark.implicits._
    val cases = Seq("aaa", "abab", "aabb", "bababa", "aaaa", "ab", "ba", "a", "")
      .filter(_.nonEmpty)
    val df = cases.toDF("w")
    val merged = df.select(col("w"),
        split(BpeTokenizer.mergePass(
          regexp_extract_all(col("w"), lit("."), lit(0)), lit("a"), lit("b")), " ")
          .as("fold"))
      .collect()
    merged.foreach { r =>
      val w = r.getString(0)
      val want = mergeOnce(w.split("").toList, "a", "b")
      assert(r.getSeq[String](1).toList == want, s"'$w'")
    }
  }

  test("token counts shrink monotonically as merges apply") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = train(corpus, 8)
    val n0 = df.select(sum(BpeTokenizer.bpeTokenCount(col("text"), Seq.empty)))
      .collect()(0).getLong(0)
    val n8 = df.select(sum(BpeTokenizer.bpeTokenCount(col("text"), merges)))
      .collect()(0).getLong(0)
    assert(n8 < n0, s"merges must reduce token count: $n8 !< $n0")
  }
}
