package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev A/B harness: time a LIST of headline queries in one session with
  * the same methodology as the frozen `graft.Bench queries` child (noop
  * sink, catalog + RDD-block cache cleared between queries, two
  * interleaved rounds, min-of-2) — `TimeQueries <sfDir> <q...>`.
  * One JVM for the whole list, so an A/B sweep over N queries costs one
  * startup instead of N.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-timequeries-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    try exhaust(graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count())
    catch { case _: Throwable => }
    val rounds = Array.fill(2)(scala.collection.mutable.Map[String, Double]())
    for (r <- 0 to 1; name <- names) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      var failed = false
      try exhaust(graft.SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        failed = true
        System.err.println(s"[timequeries] $name: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      rounds(r)(name) = if (failed) -1.0 else t
    }
    names.foreach { n =>
      val (a, b) = (rounds(0)(n), rounds(1)(n))
      println(f"QTIME=$n=$a%.3f,$b%.3f,min=${math.min(a, b)}%.3f")
    }
    spark.stop()
  }
}
