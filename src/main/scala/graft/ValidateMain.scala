package graft

import graft.images.ImageGen
import graft.validation.ImageSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for the constraint-validation engine — the
  * north-star deployment shape: validate an image+caption table
  * incrementally, checkpointing per-partition lineage/state so a rerun
  * (same outDir) resumes without re-reading done partitions, and print a
  * one-line machine-readable summary for the calling harness. Master,
  * core count, and executor topology come entirely from the submit line,
  * so the SAME invocation runs at N and 4N executors
  * (`bin/submit-validate.sh` drives that pair and reports scaling
  * efficiency).
  *
  * Usage: graft.ValidateMain <dataDir> <outDir> <runId> [warmN]
  *   dataDir   ImageGen-layout dir (images/ + captions/), OR `gen:<n>` to
  *             synthesize the deterministic n-row tier first (idempotent —
  *             an existing tier dir is reused)
  *   outDir    checkpoint root (verdicts/violations/metrics/state + side
  *             stores); reuse it across invocations to resume. `-` means
  *             generate-only: ensure the tier exists and exit without
  *             validating (the untimed generation step of a bench script)
  *   runId     stamped on verdict/violation/metric/state rows
  *   warmN     optional: run an UNTIMED warmN-row validation into a
  *             throwaway dir first, so the reported wall time measures the
  *             engine, not first-call JIT/codegen compilation (the same
  *             per-JVM warm pass the Bench protocol uses; without it a
  *             single fresh-JVM pass under-reports scaling — warmup cost
  *             is mostly serial, so it damps the N→4N ratio)
  */
object ValidateMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: graft.ValidateMain <dataDir|gen:n> <outDir|-> <runId> [warmN]")
    val Seq(dataArg, outDir, runId) = args.toSeq.take(3)
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dataDir =
      if (dataArg.startsWith("gen:")) ImageGen.ensure(spark, dataArg.stripPrefix("gen:").toLong)
      else dataArg
    if (outDir == "-") { println("GEN_ONLY_OK"); spark.stop(); return }
    args.drop(3).headOption.map(_.toLong).filter(_ > 0).foreach { warmN =>
      val warmDir = ImageGen.ensure(spark, warmN)
      val tmp = java.nio.file.Files.createTempDirectory("graft-warm").toString
      ImageSuite.runAndCheckpoint(spark, warmDir, tmp, "warm")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      spark.catalog.clearCache()
    }

    // partitions ALREADY done before this invocation: a resumed (or no-op)
    // rerun must report only what THIS run validated, not everything its
    // runId ever touched — without the delta, rerunning with the same
    // runId would claim the previous run's rows against this run's wall
    // time (a false throughput claim from the line the harness parses)
    val doneBefore = ImageSuite.readDoneParts(spark, s"$outDir/state")

    val t0 = System.nanoTime()
    ImageSuite.runAndCheckpoint(spark, dataDir, outDir, runId)
    val wallS = (System.nanoTime() - t0) / 1e9

    // summary from the state table (the commit point). An engine run over
    // an empty pending set returns before creating any store, so a fresh
    // outDir may still have no state dir — report an explicit no-op.
    val statePath = s"$outDir/state"
    val haveState = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(statePath))
    if (!haveState) {
      println(f"VALIDATE_OK run=$runId rows=0 parts=0 parts_total=0 " +
        f"violations=0 wall_s=$wallS%.2f rows_per_sec=0.0")
      spark.stop(); return
    }
    val state = spark.read.parquet(statePath).filter(col("status") === "done")
    // Exclude partitions done BEFORE this invocation via a broadcast
    // anti-join, not an isin literal: the summary runs over the state
    // TABLE (no partition pruning to buy), and at 10^5+ done partitions a
    // literal list bloats the plan for nothing — the same ceiling note as
    // the scan-side filter (ImageSuite.scala runAndCheckpoint), where isin
    // is kept ONLY because partition discovery needs compile-time
    // literals; beyond ~10^6 parts both move to Iceberg metadata pruning.
    import spark.implicits._
    val doneBeforeDf = doneBefore.toSeq.toDF("part")
    val thisRun = state.filter(col("run_id") === runId)
      .join(broadcast(doneBeforeDf), Seq("part"), "left_anti")
      .agg(coalesce(sum("n_rows"), lit(0L)).as("rows"),
        count(lit(1)).as("parts"),
        coalesce(sum("n_violations"), lit(0L)).as("viols"))
      .collect()(0)
    val partsTotal = state.select("part").distinct().count()
    println(f"VALIDATE_OK run=$runId rows=${thisRun.getLong(0)} " +
      f"parts=${thisRun.getLong(1)} parts_total=$partsTotal " +
      f"violations=${thisRun.getLong(2)} wall_s=$wallS%.2f " +
      f"rows_per_sec=${thisRun.getLong(0) / wallS}%.1f")
    spark.stop()
  }
}
