package graft.validation

import graft.SparkTestBase
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.io.File

/** The violations-store schema migration must handle all three layouts a
  * store can be in — pure legacy (no `run_id`), pure new, and MIXED (a
  * legacy store a newer build already appended `run_id` files into) — and
  * must preserve real `run_id` values. A sampled-footer check cannot see
  * the mixed case (plain reads pick one file's schema nondeterministically),
  * which is why the migration is marker-gated and reads with mergeSchema.
  */
class MigrationSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "target/migration-test"

  private def legacyRows = Seq(
    ("p0", "img-1", "bounds_w", "0", "w >= 1"),
    ("p1", "img-2", "bounds_h", "-5", "h >= 1"))
  private def newRows = Seq(
    ("p2", "img-3", "bounds_w", "0", "w >= 1", "run7"),
    ("p3", "img-4", "sentinel_fmt", "??", "known fmt", "run7"))

  test("mixed-schema violations store migrates preserving real run_id values") {
    val dir = s"$base/mixed"
    FileUtils.deleteQuietly(new File(base))
    legacyRows.toDF("part", "image_id", "check", "observed", "expected")
      .coalesce(1).write.parquet(dir)
    newRows.toDF("part", "image_id", "check", "observed", "expected", "run_id")
      .coalesce(1).write.mode("append").parquet(dir)

    ImageSuite.ensureViolationsRunId(spark, dir)

    // plain read (no mergeSchema) must now be schema-uniform and complete
    val got = spark.read.parquet(dir)
    assert(got.columns.contains("run_id"))
    assert(got.count() == 4)
    // the newer files' genuine run_id values survive the rewrite
    assert(got.filter(col("run_id") === "run7").count() == 2)
    assert(got.filter(col("run_id").isNull).count() == 2)
    // marker present → a second call must not rewrite (same file listing)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesBefore = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    ImageSuite.ensureViolationsRunId(spark, dir)
    val filesAfter = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    assert(filesBefore == filesAfter, "marked store was rewritten again")
  }

  test("pure-legacy store gains a null run_id column") {
    val dir = s"$base/legacy"
    legacyRows.toDF("part", "image_id", "check", "observed", "expected")
      .coalesce(1).write.parquet(dir)
    ImageSuite.ensureViolationsRunId(spark, dir)
    val got = spark.read.parquet(dir)
    assert(got.columns.contains("run_id") && got.count() == 2)
    assert(got.filter(col("run_id").isNull).count() == 2)
  }

  test("crashed migration (leftover .legacy dir) replays from the legacy copy") {
    val dir = s"$base/crashed"
    // authoritative copy sits at .legacy; live dir holds a partial rewrite
    legacyRows.toDF("part", "image_id", "check", "observed", "expected")
      .coalesce(1).write.parquet(dir + ".legacy")
    Seq(("px", "junk", "junk", "junk", "junk"))
      .toDF("part", "image_id", "check", "observed", "expected")
      .coalesce(1).write.parquet(dir)
    ImageSuite.ensureViolationsRunId(spark, dir)
    val got = spark.read.parquet(dir)
    assert(got.count() == 2, "partial live dir was not discarded")
    assert(got.filter(col("image_id") === "junk").isEmpty)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".legacy")))
  }
}
