package graft

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-accelerated EXACT anti-join — the 10^12-row "new vs seen" path.
  *
  * The split: build a compact Bloom summary of the build side's keys
  * (one aggregate pass, executor-merged partials; the driver holds only
  * the finished filter, never the keys — ~1.2 GB for 10^9 keys at 1%
  * FPP), then route each probe row by it:
  *
  *   - `mightContain = false` → the key is DEFINITELY absent (Bloom has
  *     no false negatives) → it IS an anti-join result; it bypasses the
  *     join shuffle entirely;
  *   - `mightContain = true`  → present or false-positive → only this
  *     slice flows into the exact anti-join, which keeps the false
  *     positives and drops the true matches.
  *
  * The shuffle saving equals the DEFINITE-ABSENT fraction of the probe,
  * so the operator's production home is the incremental-resume shape
  * (SURVEY §2 J8): probe = today's crawl, build = the seen-digest store —
  * most new keys are genuinely new, so most of a 10^12-row probe never
  * enters the exchange, while the exact join sees only (duplicates +
  * FPP·new). For a mostly-matched referential orphan hunt the split is
  * still exact but prunes little (almost everything is maybe-present) —
  * `q_v_orphans_bloom` keeps that direction oracle-honest anyway. The
  * probe is a codegen'd scalar (Spark's own `BloomFilterMightContain`,
  * the expression `InjectRuntimeFilter` plants for semi/inner runtime
  * filters) — but Spark's injector cannot help an ANTI join, because an
  * anti join's RESULT lives in the pruned part; the split has to be
  * explicit, which is what this operator does.
  *
  * Result is EXACT (provably: bloom has no false negatives, and the
  * maybe-slice is resolved by a true anti-join); `BloomAntiJoinSpec`
  * asserts set-equality with the plain anti-join (including under a
  * deliberately saturated filter), and `q_dedup_incr_bloom` /
  * `q_v_orphans_bloom` hash-match plain NOT-IN DuckDB oracles.
  *
  * Reference analogue: the reference's resume check "skip what the cache
  * already proves present" (`/root/reference/src/crawl_first/cache.py:
  * 27-44`) — a membership summary consulted before the expensive path.
  */
object BloomAntiJoin {

  /** Serialized Bloom filter (Spark sketch format) over xxhash64(key). */
  def buildFilter(build: DataFrame, key: Column,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val hashed = GraftColumnBridge.expression(xxhash64(key))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = build.select(GraftColumnBridge.column(agg).as("bf")).head()
    row.getAs[Array[Byte]](0)
  }

  /** Codegen'd probe: true iff `key` MAY be in the filter's build set. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** `probe LEFT ANTI JOIN build ON probe(probeKey) = build(buildKey)`,
    * exactly, with the definite-absent slice of `probe` skipping the join.
    * Keys must be null-free on the probe side (nulls never match an
    * equi-join, so callers that allow null keys should route them to the
    * result up front — the referential caller filters them as violations
    * of a different check before this point).
    */
  def antiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               expectedItems: Long = 1000000L,
               fpp: Double = 0.01): DataFrame = {
    // standard Bloom sizing: m = -n·ln(p)/(ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val filter = buildFilter(build, col(buildKey), expectedItems, numBits)
    val tagged = probe.withColumn("_bloom_maybe", mightContain(filter, col(probeKey)))
    val definiteAbsent = tagged.filter(!col("_bloom_maybe")).drop("_bloom_maybe")
    val maybe = tagged.filter(col("_bloom_maybe")).drop("_bloom_maybe")
    val buildKeys = build.select(col(buildKey).as("_bloom_build_key"))
    val resolved = maybe.join(buildKeys,
      col(probeKey) === col("_bloom_build_key"), "left_anti")
    definiteAbsent.unionByName(resolved)
  }
}
