package graft.operators

import graft.{SnapshotQueries, SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Independent plain-Scala replay of the snapshot synthesis + diff, plus
  * the two structural guarantees the module sells: (a) only 1995 months
  * fingerprint dirty, (b) the pruned diff equals the full diff on
  * added/removed/changed — the Merkle property that makes reconciliation
  * affordable at 10^12 rows.
  */
class SnapshotDiffSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private case class O(key: Long, cust: Long, status: String,
                       cents: Long, date: String, prio: String)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hb(key: Long): Int = Integer.parseInt(md5hex(key.toString).substring(0, 2), 16)

  private lazy val baseRows: Seq[O] =
    Tables(spark, dir, "orders").collect().toSeq.map { r =>
      val d = r.getAs[java.time.LocalDateTime]("o_orderdate")
      O(r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
        r.getAs[String]("o_orderstatus"),
        math.round(r.getAs[Double]("o_totalprice") * 100),
        d.toLocalDate.toString, r.getAs[String]("o_orderpriority"))
    }

  private def inWin(o: O): Boolean = o.date >= "1995-01-01" && o.date < "1996-01-01"

  private lazy val curRows: Seq[O] = {
    val kept = baseRows.filterNot(o => inWin(o) && hb(o.key) < 40).map { o =>
      if (inWin(o) && hb(o.key) >= 40 && hb(o.key) < 120)
        o.copy(cents = o.cents + 1000, prio = "9-RECLASS")
      else o
    }
    val added = baseRows.filter(o => inWin(o) && hb(o.key) >= 216)
      .map(o => o.copy(key = o.key + 900000000L, status = "N"))
    kept ++ added
  }

  private def content(o: O): String =
    Seq(o.key, o.cust, o.status, o.cents, o.date, o.prio).mkString("|")

  test("planted mutations are non-trivial at sf0.001") {
    val b = baseRows.map(o => o.key -> content(o)).toMap
    val c = curRows.map(o => o.key -> content(o)).toMap
    assert((b.keySet -- c.keySet).nonEmpty, "some removed")
    assert((c.keySet -- b.keySet).nonEmpty, "some added")
    assert((b.keySet & c.keySet).exists(k => b(k) != c(k)), "some changed")
  }

  test("q_snap_diff matches the plain-Scala replay") {
    val b = baseRows.map(o => o.key -> content(o)).toMap
    val c = curRows.map(o => o.key -> content(o)).toMap
    val expect = Map(
      "removed" -> (b.keySet -- c.keySet).size.toLong,
      "added" -> (c.keySet -- b.keySet).size.toLong,
      "changed" -> (b.keySet & c.keySet).count(k => b(k) != c(k)).toLong,
      "unchanged" -> (b.keySet & c.keySet).count(k => b(k) == c(k)).toLong)
    val got = SnapshotQueries.queries("q_snap_diff")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("only 1995 months are dirty; clean months fingerprint identical") {
    val rows = SnapshotQueries.queries("q_snap_dirty_parts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val part = r.getAs[String]("part")
      val status = r.getAs[String]("status")
      if (part.startsWith("1995")) assert(status == "dirty", s"$part should be dirty")
      else assert(status == "clean", s"$part should be clean, was $status")
    }
    assert(rows.count(_.getAs[String]("status") == "dirty") == 12)
  }

  test("pruned diff equals the full diff on added/removed/changed") {
    val full = SnapshotQueries.queries("q_snap_diff")(spark, dir)
      .filter(col("status") =!= "unchanged")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned = SnapshotQueries.queries("q_snap_diff_pruned")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned == full)
  }

  test("changed-column attribution: only price and priority move") {
    val r = SnapshotQueries.queries("q_snap_changed_cols")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_o_custkey") == 0L)
    assert(r.getAs[Long]("n_o_orderstatus") == 0L)
    val changed = baseRows.count(o => inWin(o) && hb(o.key) >= 40 && hb(o.key) < 120)
    assert(r.getAs[Long]("n_o_totalprice") == changed.toLong)
    assert(r.getAs[Long]("n_o_orderpriority") == changed.toLong)
  }

  test("fingerprint sensitivity: a single one-column edit flips its partition dirty") {
    val base = SnapshotQueries.baseSnapshot(spark, dir)
    val oneKey = baseRows.head.key
    val edited = base.withColumn("o_custkey",
      when(col("o_orderkey") === oneKey, col("o_custkey") + 1)
        .otherwise(col("o_custkey")))
    val verdicts = SnapshotQueries.dirtyPartitions(
      SnapshotQueries.partitionFingerprints(base),
      SnapshotQueries.partitionFingerprints(edited)).collect()
    val dirty = verdicts.filter(_.getAs[String]("status") == "dirty").map(_.getAs[String]("part"))
    val expectPart = baseRows.head.date.substring(0, 7)
    assert(dirty.toSeq == Seq(expectPart))
  }

  test("revalidation plan: skip done-clean, validate new-clean, revalidate dirty") {
    val rows = SnapshotQueries.queries("q_snap_reval_plan")(spark, dir).collect()
    rows.foreach { r =>
      val (part, status, action) = (r.getAs[String]("part"),
        r.getAs[String]("status"), r.getAs[String]("action"))
      val expect =
        if (status == "dirty") "revalidate"
        else if (part < "1996-07") "skip"
        else "validate"
      assert(action == expect, s"$part ($status): $action != $expect")
    }
    // all 1995 months are dirty → revalidated even where the checkpoint
    // claims them done (Jan–Jun 1995): stale verdicts never survive
    assert(rows.count(_.getAs[String]("action") == "revalidate") == 12)
    assert(rows.exists(_.getAs[String]("action") == "skip"))
    assert(rows.exists(_.getAs[String]("action") == "validate"))
  }

  test("revalidation plan handles retired and added partitions") {
    import spark.implicits._
    val verdicts = Seq(
      ("p1", "clean"), ("p2", "dirty"), ("p3", "part_removed"),
      ("p4", "part_added"), ("p5", "clean"))
      .toDF("part", "status")
    val done = Seq("p1", "p2", "p3").toDF("part")
    val got = SnapshotQueries.revalidationPlan(verdicts, done)
      .collect().map(r => r.getAs[String]("part") -> r.getAs[String]("action")).toMap
    assert(got == Map("p1" -> "skip", "p2" -> "revalidate",
      "p3" -> "retire", "p4" -> "validate", "p5" -> "validate"))
  }

  test("schemaDiff reports added/removed/type-changed columns") {
    val a = StructType(Seq(
      StructField("id", LongType), StructField("w", IntegerType),
      StructField("caption", StringType)))
    val b = StructType(Seq(
      StructField("id", LongType), StructField("w", LongType),
      StructField("phash", LongType)))
    val got = SnapshotQueries.schemaDiff(spark, a, b).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("caption", "removed"), ("phash", "added"), ("w", "type_changed")))
  }
}
