package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for q_dedup_phash_mirror's cost structure. */
object MirrorProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.expressions.Window
    val f = graft.validation.ImageSuiteQueries.ensureFacts(s, dir)
    time("facts count")(println(f.count()))
    val first = f.filter(col("decode_ok"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("image_id").orderBy("phash_rec", "n_bytes")))
      .filter(col("rn") === 1)
    time("first count")(println(first.count()))
    val sig = first.select(col("image_id").as("doc_id"),
        col("phash_rec").as("phash"),
        posexplode(col("phash_d4")).as(Seq("kind", "hash")))
      .filter(col("hash") =!= 0L)
    time("sig count")(println(sig.count()))
    val mask = lit(65535L)
    val bands = sig.select(col("doc_id"), col("phash"), col("kind"), col("hash"),
        explode(array((0 until 4).map { j =>
          struct(lit(j).as("band"),
            shiftright(col("hash"), j * 16).bitwiseAND(mask).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("phash"), col("kind"), col("hash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val bucket = Window.partitionBy("band", "key")
    val run = bucket.orderBy("hash", "doc_id", "kind")
    val ranked = bands
      .withColumn("bn", count(lit(1)).over(bucket))
      .withColumn("rn", row_number().over(run))
    time("ranked count")(println(ranked.count()))
    val cand = ranked.as("x").join(ranked.as("y"),
        col("x.band") === col("y.band") &&
          col("x.key") === col("y.key") && col("x.rn") < col("y.rn") &&
          (col("x.bn") <= 4 || col("y.bn") <= 4 ||
            col("y.rn") - col("x.rn") <= 4))
    time("raw candidate count")(println(cand.count()))
    val mixed = cand.filter(col("x.doc_id") =!= col("y.doc_id") &&
      ((col("x.kind") === 0) =!= (col("y.kind") === 0)))
    time("mixed candidate count")(println(mixed.count()))
    val full = graft.DedupQueries.queries("q_dedup_phash_mirror")(s, dir)
    time("full query")(println(full.count()))
    s.stop()
  }
}
