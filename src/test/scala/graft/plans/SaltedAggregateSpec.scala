package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** The salted-aggregate optimizer rule: plan shape (two logical
  * aggregates, salt in the inner grouping) and result equivalence with
  * the plain aggregate on skewed data, plus the safe fallbacks.
  */
class SaltedAggregateSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    SaltedAgg.install(spark)
  }

  import org.apache.spark.sql.DataFrame

  // skewed input: ~1/3 of 30k rows share one hot key
  lazy val skewed: DataFrame = {
    import spark.implicits._
    spark.range(30000).select(
      when(col("id") % 3 === 0, "hot").otherwise(col("id").cast("string")).as("k"),
      col("id").as("v"),
      (col("id") % 7).cast("double").as("d"))
  }

  private def salted =
    skewed.groupBy(SaltedAgg.saltKey(col("k")).as("k")).agg(
      count(lit(1)).as("n"), sum("v").as("sv"),
      min("v").as("mn"), max("d").as("mx"))

  private def plain =
    skewed.groupBy(col("k")).agg(
      count(lit(1)).as("n"), sum("v").as("sv"),
      min("v").as("mn"), max("d").as("mx"))

  private def collectSorted(df: DataFrame) =
    df.orderBy("k").collect().map(_.toSeq).toSeq

  test("rewrites to a two-stage aggregate with the salt in the inner grouping") {
    val optimized = salted.queryExecution.optimizedPlan
    val aggs = optimized.collect { case a: Aggregate => a }
    assert(aggs.size == 2, s"expected 2 logical aggregates, got:\n$optimized")
    val inner = aggs.last
    assert(inner.groupingExpressions.size == 2, "inner grouping must be (key, salt)")
    assert(inner.groupingExpressions.exists(_.sql.contains("xxhash64")),
      s"salt missing from inner grouping: ${inner.groupingExpressions.map(_.sql)}")
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[SaltKey])),
      "marker leaked into the optimized plan")
  }

  test("salted results equal plain results on skewed data") {
    assert(collectSorted(salted) == collectSorted(plain))
  }

  test("schema is unchanged by the rewrite") {
    assert(salted.schema == plain.schema)
  }

  test("non-decomposable aggregate falls back to a single plain aggregate") {
    val avgSalted = skewed.groupBy(SaltedAgg.saltKey(col("k")).as("k"))
      .agg(avg("v").as("a"))
    val aggs = avgSalted.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.size == 1, "avg must not be decomposed")
    assert(!avgSalted.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[SaltKey])), "marker must be stripped")
    val expected = skewed.groupBy(col("k")).agg(avg("v").as("a"))
    assert(collectSorted(avgSalted) == collectSorted(expected))
  }

  test("decimal sum falls back (precision widening would change the schema)") {
    val dec = skewed.withColumn("m", col("v").cast("decimal(10,2)"))
    val saltedDec = dec.groupBy(SaltedAgg.saltKey(col("k")).as("k")).agg(sum("m").as("s"))
    val plainDec = dec.groupBy(col("k")).agg(sum("m").as("s"))
    assert(saltedDec.schema == plainDec.schema)
    assert(collectSorted(saltedDec) == collectSorted(plainDec))
  }

  test("marker outside an aggregate is inert") {
    val projected = skewed.select(SaltedAgg.saltKey(col("k")).as("k2"), col("v"))
      .filter(col("v") < 10)
    assert(projected.count() == 10)
  }
}
