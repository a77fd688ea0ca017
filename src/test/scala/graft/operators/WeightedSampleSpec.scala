package graft

import org.apache.spark.sql.functions._

/** [[graft.operators.Sampling.weightedTopK]] (Efraimidis–Spirakis A-ES)
  * vs plain-Scala recomputation, plus the two properties that make it a
  * WEIGHTED sample: heavier rows are sampled more often, and the draw
  * replays identically across runs/partitionings. */
class WeightedSampleSpec extends SparkTestBase {

  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def u(id: Long): Double =
    (java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16)
      .toDouble + 1.0) / 4294967296.0

  test("matches plain-Scala A-ES selection exactly") {
    val rows = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble))
    val got = graft.operators.Sampling
      .weightedTopK(rows.toDF("id", "w"), col("id"), "w", k = 50)
      .select("id").as[Long].collect().toSet
    val want = rows.map { case (i, w) => (i, math.log(u(i)) / w) }
      .sortBy { case (i, key) => (-key, i) }.take(50).map(_._1).toSet
    assert(got === want)
  }

  test("heavier rows are sampled preferentially") {
    // two weight classes, same count: weight 10 vs weight 1
    val rows = (1L to 1000L).map(i => (i, if (i <= 500) 10.0 else 1.0))
    val got = graft.operators.Sampling
      .weightedTopK(rows.toDF("id", "w"), col("id"), "w", k = 200)
      .select("id").as[Long].collect()
    val heavy = got.count(_ <= 500)
    assert(heavy > 150, s"weight-10 rows should dominate: got $heavy/200")
  }

  test("draw is identical across partitionings and excludes w <= 0") {
    val rows = (1L to 300L).map(i => (i, if (i % 10 == 0) 0.0 else i.toDouble))
    val df1 = rows.toDF("id", "w").repartition(1)
    val df8 = rows.toDF("id", "w").repartition(8)
    val s1 = graft.operators.Sampling
      .weightedTopK(df1, col("id"), "w", k = 40).select("id")
      .as[Long].collect().toSeq
    val s8 = graft.operators.Sampling
      .weightedTopK(df8, col("id"), "w", k = 40).select("id")
      .as[Long].collect().toSeq
    assert(s1 === s8)
    assert(s1.forall(_ % 10 != 0), "zero-weight rows must never be drawn")
  }

  test("top-k plan is TakeOrderedAndProject, not a global sort") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "w")
    val plan = graft.operators.Sampling.weightedTopK(df, col("id"), "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}

/** [[graft.validation.Analyzers.embeddingSanity]] with planted ragged /
  * NaN / zero / null / off-norm vectors. */
class EmbeddingSanitySpec extends SparkTestBase {

  import spark.implicits._
  import graft.validation.Analyzers

  test("clean unit-norm corpus passes with tight envelope") {
    val vecs = (1 to 50).map { i =>
      val raw = Array.tabulate(8)(j => (i + j + 1).toFloat)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat))
    }
    val r = Analyzers.embeddingSanity(vecs.toDF("vec_id", "embedding"),
      "embedding", 0.999, 1.001).collect().head
    assert(r.getAs[Boolean]("pass"))
    assert(r.getAs[Int]("dims_min") === 8)
    assert(r.getAs[Int]("dims_max") === 8)
    assert(r.getAs[Long]("n_nonfinite") === 0L)
  }

  test("ragged, NaN, zero, null, and off-norm vectors are each counted") {
    val ok = Array.fill(4)(0.5f) // norm 1
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> ok,
      2L -> Array.fill(3)(0.5f),                      // ragged dims
      3L -> Array(Float.NaN, 0.5f, 0.5f, 0.5f),       // NaN
      4L -> Array.fill(4)(0.0f),                      // zero vector
      5L -> null,                                     // null vector
      6L -> Array.fill(4)(2.0f))                      // norm 4, off-envelope
    val r = Analyzers.embeddingSanity(rows.toDF("vec_id", "embedding"),
      "embedding", 0.999, 1.001).collect().head
    assert(!r.getAs[Boolean]("pass"))
    assert(r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[Long]("n_nonfinite") === 1L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Int]("dims_min") === 3)
    assert(r.getAs[Int]("dims_max") === 4)
    assert(r.getAs[Double]("norm_max") === 4.0)
  }
}
