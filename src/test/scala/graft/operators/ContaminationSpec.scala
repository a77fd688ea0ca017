package graft.operators

import graft.{Contamination, SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Soundness and pruning behavior of the two-pass (Bloom nominate →
  * exact confirm) benchmark-decontamination operator. The DuckDB oracle
  * (`q_curate_decontaminate`) pins the exact output; these specs pin the
  * internal guarantees the oracle can't see.
  */
class ContaminationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def d: DataFrame = Tables(spark, dir, "documents")

  /** Sketch-free twin: exact per-doc true overlap for EVERY probe doc. */
  private def plainOverlap: DataFrame = {
    val withG = d.filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= Contamination.N)
      .select(col("doc_id"), Contamination.ngrams(col("text")).as("grams"))
    val bench = withG.filter(Contamination.isBench(col("doc_id")))
      .select(explode(col("grams")).as("g")).distinct()
    withG.filter(!Contamination.isBench(col("doc_id")))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_ngrams"),
        explode(col("grams")).as("g"))
      .join(bench, Seq("g"), "left_semi")
      .groupBy("doc_id", "n_ngrams").agg(count(lit(1)).as("n_overlap"))
  }

  test("two-pass result equals the sketch-free exact computation") {
    val got = Contamination.contaminated(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = plainOverlap
      .filter(round(col("n_overlap").cast("double") / col("n_ngrams"), 6)
        >= Contamination.Tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture must contain contaminated docs")
    assert(got == want)
  }

  test("bloom nomination has NO false negatives (hits >= true hits, per doc)") {
    val trueHits = plainOverlap.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nominated = Contamination.nominate(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bloom_hits"))).toMap
    assert(trueHits.nonEmpty)
    trueHits.foreach { case (id, t) =>
      assert(nominated(id) >= t,
        s"doc $id: bloom_hits ${nominated(id)} < true overlap $t")
    }
  }

  test("nomination prunes: the exact join sees a small fraction of the corpus") {
    val nom = Contamination.nominate(d)
    val probeDocs = nom.count()
    val suspicious = nom.filter(
      col("bloom_hits").cast("double") >= col("n_ngrams") * Contamination.Tau).count()
    assert(suspicious.toDouble / probeDocs < 0.2,
      s"bloom pass barely prunes: $suspicious/$probeDocs suspicious")
  }

  test("nomination pass plans ZERO shuffles (the 10^12-row leg moves no data)") {
    val p = Contamination.nominate(d).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"nomination shuffles data:\n$p")
  }
}
