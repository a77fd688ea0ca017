package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** spark-submit smoke: proves the packaged jar runs under a stock
  * `spark-submit` with `--conf spark.sql.extensions=graft.plans.
  * GraftExtensions` — the SQL function `salt_key` resolves, the optimizer
  * rule rewrites the aggregation into the two-stage salted form, and the
  * result matches the plain aggregation. This exercises the
  * SparkSessionExtensions path that in-JVM tests cannot (the shared test
  * session is created before extensions could be configured).
  *
  * Run: bin/submit-smoke.sh [sfDir]
  */
object SubmitSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().getOrCreate() // master/extensions from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")

    val salted = spark.sql(
      """SELECT salt_key(l_returnflag) AS k, count(*) AS n,
         CAST(sum(l_quantity) AS DOUBLE) AS s
         FROM lineitem GROUP BY salt_key(l_returnflag)""")
    val plain = spark.sql(
      """SELECT l_returnflag AS k, count(*) AS n,
         CAST(sum(l_quantity) AS DOUBLE) AS s
         FROM lineitem GROUP BY 1""")

    val aggs = salted.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    require(aggs.size == 2,
      s"salted-agg rule did not fire under spark-submit:\n${salted.queryExecution.optimizedPlan}")
    val a = salted.orderBy("k").collect().map(_.toSeq).toSeq
    val b = plain.orderBy("k").collect().map(_.toSeq).toSeq
    require(a == b, s"salted results diverge: $a vs $b")
    println(s"SUBMIT_SMOKE_OK logical_aggregates=${aggs.size} groups=${a.size}")
    spark.stop()
  }
}
