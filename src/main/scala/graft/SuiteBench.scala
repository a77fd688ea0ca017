package graft

import graft.images.ImageGen
import graft.validation.ImageSuite
import org.apache.spark.sql.SparkSession

/** Focused scaling experiment: run ONLY the constraint suite at a list of
  * parallelism levels over the same pre-generated tier.
  * Usage: SuiteBench <nImages> <cpus,cpus,...> [maxPartitionBytes]
  */
object SuiteBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val levels = (if (args.length > 1) args(1) else "8,32").split(",").map(_.toInt)
    val mpb = if (args.length > 2) args(2) else "16m"

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"suite-bench-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    var spark = session(levels.max)
    val dir = ImageGen.ensure(spark, n)
    // warm page cache
    val (v0, vi0, m0) = ImageSuite.run(spark, dir, "warm")
    Seq(v0, vi0, m0).foreach(_.write.mode("overwrite").format("noop").save())
    spark.stop()

    levels.foreach { cpus =>
      spark = session(cpus)
      val sp = spark
      import org.apache.spark.sql.functions.col
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.mode("overwrite").format("noop").save()
      // three measured rounds per level (JIT/codegen warm by round 3)
      for (round <- 1 to 1) {
        val total = t {
          val (v, vi, m) = ImageSuite.run(sp, dir, s"l$cpus-$round")
          noop(v); noop(vi); noop(m)
        }
        println(f"SUITEBENCH cpus=$cpus round=$round total=$total%.2f imgs_per_sec=${n / total}%.0f")
        sp.catalog.clearCache()
      }
      spark.stop()
    }
  }
}
