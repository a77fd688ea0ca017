package graft

import graft.validation.{Intervals, MaskProfile, Profiler, Scoring, StatChecks, Timeliness}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The constraint-validation operator suite (north rule) exercised over the
  * driver's testdata tables, so each check is DuckDB-oracle-verified. The
  * same operators run over the image+caption table in `ImageSuite` (where
  * correctness is ScalaTest-verified against plain-Scala recomputation).
  *
  * Reference semantics being re-expressed
  * (file:line into /root/reference/src/crawl_first/):
  *   - uniqueness → keep-first dedup + violation accounting `osm.py:639-655`
  *   - referential → study-lookup failure path `analysis.py:1207-1210`
  *   - column stats / coverage → `validation_agent.py:550-597, 753-763`
  *   - bounds/sentinel row checks → `validation_agent.py:355-364`
  *   - drift vs peers/priors → `validation_agent.py:85-109, 258-305`
  *   - verdict always emitted, errors become rows → `validation_agent.py:600-650`
  */
object ValidationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Segmented-drift flag threshold: chi²/n_buckets above this drifts. */
  val SegDriftThreshold = 2.0

  /** The demo [[validation.CheckSuite]] over `orders` — one declared
    * suite, one aggregation pass, DuckDB oracle generated from the same
    * definitions ([[validation.CheckSuite.duckSql]]). */
  val ordersSuite: validation.CheckSuite = validation.CheckSuite(Seq(
    validation.Complete("o_custkey", 1.0),
    validation.Unique(Seq("o_orderkey")),
    validation.InSet("o_orderstatus", Seq("O", "F", "P"), 1.0),
    validation.InRange("o_totalprice", 0.0, 600000.0, 1.0),
    validation.Matches("o_orderpriority", "^[1-5]-", 1.0),
    validation.MeanBetween("o_totalprice", 100000.0, 400000.0),
    validation.QuantileBetween("o_totalprice", 0.5, 50000.0, 400000.0),
    validation.MinGte("o_totalprice", 0.0),
    validation.MaxLte("o_totalprice", 1000000.0),
    validation.SizeBetween(100L, 10000000000L),
    validation.Satisfies("paid_or_open", "o_totalprice > 0 OR o_orderstatus = 'O'", 1.0)))

  /** Shared-syntax baseline slice for the anomaly demo (both engines
    * cast the literal to the column's timestamp type). */
  val AnomalyBaselineWhere = "o_orderdate < '1998-01-01'"

  /** Shared-syntax interval derivation for `q_v_intervals`: epoch-µs
    * bounds from the events timeline with a deterministic duration
    * keyed off event_id, so Spark and DuckDB construct bit-identical
    * interval tables (events.ts is TIMESTAMP_NTZ; the cast makes
    * epoch extraction legal in both engines under UTC). */
  val IntervalKeySql = "user_id"
  val IntervalFromSql = "unix_micros(CAST(ts AS TIMESTAMP))"
  val IntervalToSql =
    "unix_micros(CAST(ts AS TIMESTAMP)) + (60 + event_id % 600) * 1000000"
  val DuckIntervalFromSql = "epoch_us(ts)"
  val DuckIntervalToSql = "epoch_us(ts) + (60 + event_id % 600) * 1000000"
  val IntervalGapTolUs: Long = 900L * 1000000L

  /** Fixed ECF grid + standardization scale (never data-derived —
    * replay must be bit-identical). */
  val EcfScale = 50000.0
  val EcfFreqs: Seq[Double] = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0)

  /** Static column/kind lists for the profiler oracles — must mirror the
    * parquet schemas (a drift fails the hash compare, which is the gate
    * doing its job). */
  val OrdersProfileCols: Seq[(String, Profiler.Kind)] = Seq(
    "o_orderkey" -> Profiler.Integral, "o_custkey" -> Profiler.Integral,
    "o_orderstatus" -> Profiler.Str, "o_totalprice" -> Profiler.Fractional,
    "o_orderdate" -> Profiler.TimeLike, "o_orderpriority" -> Profiler.Str)

  val EventsProfileCols: Seq[(String, Profiler.Kind)] = Seq(
    "event_id" -> Profiler.Integral, "ts" -> Profiler.TimeLike,
    "user_id" -> Profiler.Integral, "event_type" -> Profiler.Str,
    "value" -> Profiler.Fractional, "props" -> Profiler.Str)

  /** Numeric columns for the pairwise correlation matrix oracle. */
  val CorrCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** UCC sweep columns over `orders`. */
  val OrdersUccCols: Seq[String] = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_orderdate", "o_totalprice")

  /** FD sweep columns over `part` — the PK plus every low-NDV
    * attribute; no non-key FD holds in this corpus, which the oracle
    * verifies pair by pair alongside the 4 PK-determined ones. */
  val PartFdCols: Seq[String] =
    Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  /** Row-level suite over lineitem whose checks genuinely fail on part
    * of the corpus — drives [[validation.CheckSuite.annotate]]/`split`
    * (per-row violation labels + quarantine routing). */
  val lineitemRowSuite: validation.CheckSuite = validation.CheckSuite(Seq(
    validation.Complete("l_shipdate", 1.0),
    validation.InRange("l_quantity", 1.0, 45.0, 1.0),
    validation.Matches("l_returnflag", "^[AR]$", 0.5),
    validation.Satisfies("low_discount", "l_discount <= 0.08", 0.9)))

  /** Grouped twin: per-status verdicts (the per-partition pass/fail
    * emission shape) — exact-percentile checks excluded so every member
    * stays algebraic under groupBy. */
  val ordersSuiteGrouped: validation.CheckSuite = validation.CheckSuite(Seq(
    validation.Complete("o_custkey", 1.0),
    validation.InRange("o_totalprice", 0.0, 600000.0, 1.0),
    validation.MeanBetween("o_totalprice", 100000.0, 400000.0),
    validation.MinGte("o_totalprice", 0.0),
    validation.SizeBetween(100L, 10000000000L)))

  /** Uniqueness verdict for one key set: two-stage salted aggregate.
    * Stage 1 pre-aggregates on (key, salt) so a pathologically hot key
    * cannot overload one reducer; stage 2 merges per key. Semantically
    * identical to a plain `groupBy(key).count()` — the salt only reshapes
    * the shuffle (SURVEY.md §4 skew row).
    */
  def uniquenessVerdict(df: DataFrame, checkName: String, keys: Seq[String],
                        saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)).as("salt")
    val stage1 = df.groupBy(keyCols :+ salt: _*).agg(count(lit(1)).as("c1"))
    val perKey = stage1.groupBy(keyCols: _*).agg(sum(col("c1")).as("n"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_keys"),
      sum(when(col("n") > 1, col("n") - 1).otherwise(0)).as("n_extra_rows"))
      .select(lit(checkName).as("check"), col("n_rows"), col("n_keys"),
        col("n_dup_keys"), col("n_extra_rows"),
        (col("n_dup_keys") === 0).as("pass"))
  }

  /** Referential verdict: count of child keys with no parent (left anti). */
  def referentialVerdict(child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String,
                         checkName: String): DataFrame = {
    val orphans = child.join(parent,
      child(childKey) === parent(parentKey), "left_anti")
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(checkName).as("check"), col("n_rows"), col("n_orphans"),
        (col("n_orphans") === 0).as("pass"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Declarative check suite: 11 constraints, ONE aggregation pass over
    // orders (ChecksSpec plan-asserts the single scan). The oracle SQL is
    // GENERATED from the same suite definition.
    "q_v_checksuite" -> ((s, dir) => ordersSuite.run(t(s, dir, "orders"))),

    // Per-group verdict emission: same API, one hash-aggregate shuffle.
    "q_v_checksuite_grouped" -> ((s, dir) =>
      ordersSuiteGrouped.run(t(s, dir, "orders"), Seq("o_orderstatus"))),

    // Metric anomaly detection: current (full) orders vs the pre-1998
    // slice as the baseline run — same suite, generated DuckDB twin of
    // both aggregates plus the delta math.
    "q_v_anomaly" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      validation.MetricAnomaly.vs(
        ordersSuite.run(o),
        ordersSuite.run(o.filter(expr(AnomalyBaselineWhere))),
        maxAbsDelta = 0.001, maxRelDelta = 0.05)
    }),

    // Sequential trend monitoring: the grouped suite keyed by order YEAR
    // as the run history (7 runs × 5 checks), EWMA control chart per
    // check (λ=0.3, L=3, Phase-I baseline = first 4 runs) — small
    // persistent shifts accumulate in the EWMA long before any single
    // run trips q_v_anomaly's pairwise delta. The run² self-join is over
    // run-level metadata (KB at any table scale), never rows.
    "q_v_trend" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("run_id", year(col("o_orderdate")).cast("string"))
      validation.MetricTrend.ewma(
        ordersSuiteGrouped.run(o, Seq("run_id")), lam = 0.3, l = 3.0,
        baselineRuns = 4)
    }),

    // Tabular CUSUM over the same run history (k=0.5, h=4, Phase-I
    // baseline = first 4 runs) — the linear-accumulation sibling of the
    // EWMA chart: a one-sided cumulative sum that resets at 0 while in
    // control, closed-formed as prefix-sum minus running prefix-min
    // (two sequential windows over run-level metadata, no self-join).
    "q_v_cusum" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("run_id", year(col("o_orderdate")).cast("string"))
      validation.MetricTrend.cusum(
        ordersSuiteGrouped.run(o, Seq("run_id")), k = 0.5, h = 4.0,
        baselineRuns = 4)
    }),

    // Single-pass column profile of orders (exact-NDV oracle rung): one
    // aggregation, one profile row per column; the DuckDB twin is
    // GENERATED from the same static column/kind list.
    "q_v_profile" -> ((s, dir) => Profiler.profile(t(s, dir, "orders"))),

    // Constraint suggestion over events (exercises every ladder arm the
    // data allows: unique+in_range on event_id, in_set on 5-value
    // event_type, str_len on 100-value props, in_range on value,
    // complete everywhere).
    "q_v_suggest" -> ((s, dir) => Profiler.suggest(t(s, dir, "events"))),

    // Pairwise Pearson correlation matrix over lineitem's numeric
    // columns — ONE aggregation pass, O(p²) decimal-exact counters of
    // state, pairwise-complete (both finite); the profiler's
    // cross-column face. All six pairs hover near 0 in this synthetic
    // corpus (columns drawn independently) — which is itself the check:
    // a validation engine confirming a claimed-independent layout IS
    // independent before trusting it as a stratification basis.
    "q_v_corr_matrix" -> ((s, dir) =>
      Profiler.correlations(t(s, dir, "lineitem"), CorrCols)),

    // Spearman twin of the same matrix: Pearson over average ranks —
    // monotone association, ~1/n leverage-point sensitivity. Exact rung
    // (one global sort window per column, declared fenced; production =
    // t-digest CDF transform).
    "q_v_spearman" -> ((s, dir) =>
      Profiler.spearman(t(s, dir, "lineitem"), CorrCols)),

    // Benford first-digit conformance of l_extendedprice: 9 counters of
    // state, chi² vs log10(1+1/d) at dof 8. TPC-H prices are
    // range-bounded, not scale-invariant, so the verdict is a planted
    // deterministic FAIL — the check detecting exactly what it should.
    "q_v_benford" -> ((s, dir) =>
      StatChecks.benford(t(s, dir, "lineitem"), "l_extendedprice")),

    // Chi-square independence of o_orderstatus × o_orderpriority over
    // the FULL 3×5 grid (unobserved cells still contribute expected
    // counts); every window downstream of the one (x,y) shuffle runs on
    // category-count-sized frames. dof 8 → critical 15.507 at 0.95.
    "q_v_independence" -> ((s, dir) =>
      StatChecks.independence(t(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority", critical = 15.507)),

    // Association STRENGTH for the same pair: mutual information +
    // Cramér's V — at 10^12 rows chi² rejects for 10^-5 correlations,
    // so only the effect size is informative; same one-(x,y)-shuffle
    // grid, single-row finalize.
    "q_v_mi" -> ((s, dir) =>
      StatChecks.mutualInfo(t(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")),

    // EXACT two-sample KS of o_totalprice across the anomaly-baseline
    // date split — the oracle rung for the production t-digest sketch
    // KS (Drift): grouped ECDFs make the sorted frame NDV-sized and
    // tie-proof; the global cumulative window is the declared fenced
    // cost (production path is the sketch).
    "q_v_ks_exact" -> ((s, dir) =>
      StatChecks.ksTwoSample(t(s, dir, "orders"), "o_totalprice",
        AnomalyBaselineWhere)),

    // Theil–Sen robust trend per check over the same run history: the
    // ESTIMATOR beside the EWMA/CUSUM detectors — median of pairwise
    // slopes (29.3% breakdown: one corrupt run cannot tilt it the way it
    // tilts OLS). runs² self-join over run-level metadata, never rows.
    "q_v_theilsen" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("run_id", year(col("o_orderdate")).cast("string"))
      validation.MetricTrend.theilSen(
        ordersSuiteGrouped.run(o, Seq("run_id")), slopeTol = 0.01)
    }),

    // Potter's-Wheel mask profiling: character-class masks (A/a/9 runs)
    // discover a field's dominant syntactic structures + the rare
    // variant masks that ARE the malformed rows. Profiled over the
    // document-text prefix (shared substr syntax) because that column
    // has genuine structural variety — 6 masks with a real rank/coverage
    // ladder; the star-schema strings are single-mask uniform, which the
    // operator would report in one row. One codegen'd projection + one
    // shuffle on the mask; every window downstream is
    // mask-cardinality-sized.
    "q_v_masks" -> ((s, dir) =>
      MaskProfile.masks(t(s, dir, "documents"), "substr(text, 1, 16)",
        topK = 20)),

    // ECOD outliers over lineitem's numeric margins: ECDF tail mass per
    // dimension, summed −ln tail per row — the shape-free sibling of
    // MAD (unimodal) and Mahalanobis (elliptical). One shuffle on dim,
    // RANGE-frame window tail counts per row, top-K (no join).
    "q_v_outliers_ecod" -> ((s, dir) =>
      StatChecks.ecodOutliers(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_orderkey", "l_linenumber"), topK = 100)),

    // Grid-ECDF production rung of the same scorer: one percentile-array
    // pass → broadcast round-6 grid → codegen'd HOF tail counts; two
    // scans, no window/join. The 10^12 swap (exact percentiles →
    // t-digest quantiles) keeps this exact plan shape.
    "q_v_outliers_ecod_grid" -> ((s, dir) =>
      StatChecks.ecodOutliersGrid(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_orderkey", "l_linenumber"), gridN = 255, topK = 100)),

    // Robust outlier accounting on the skewed events.value: median/MAD
    // Hampel rule at k=3.5 — mean/σ gates are masked by the very
    // outliers they hunt (50% breakdown point here). Exact-quantile
    // rung (3 single-row-state scans); production swaps in t-digest.
    "q_v_outliers_mad" -> ((s, dir) =>
      StatChecks.robustOutliers(t(s, dir, "events"), "value")),

    // Bivariate Mahalanobis outliers on (per-order item count, order
    // total price): orders whose JOINT position is extreme even where
    // neither marginal is — the multivariate complement of
    // q_v_outliers_mad (28 flagged at sf0.01 under the χ²₂ 0.999 gate).
    // One count aggregation + one exact-decimal moment pass + a
    // broadcast-stats scoring projection.
    "q_v_outliers_mahalanobis" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1L)).as("cnt"))
      val base = t(s, dir, "orders")
        .join(li, col("o_orderkey") === col("k"), "left")
        .select(col("o_orderkey"),
          coalesce(col("cnt"), lit(0L)).cast("double").as("n_items"),
          col("o_totalprice").cast("double").as("total_price"))
      StatChecks.mahalanobisOutliers(base, "n_items", "total_price",
        Seq("o_orderkey"))
    }),

    // Timeliness — per-event-type freshness vs a pinned `now` (never
    // wall-clock: verdicts must replay bit-identically) + largest
    // intra-segment arrival gap; one segment-keyed sort window + one
    // groupBy, scalar state per segment.
    "q_v_freshness" -> ((s, dir) =>
      Timeliness.freshness(t(s, dir, "events"), "ts", "event_type",
        "2024-02-01 00:00:00", maxLagHours = 36.0, maxGapHours = 4.0)),

    // Validity-interval consistency per user timeline (SCD2 shape):
    // overlap = two versions simultaneously current, gap = no current
    // version. Sweep-line running-max (not lag) so nested intervals
    // can't hide; one shuffle on key + one sort window, no joins.
    // Intervals derive deterministically from events (duration keyed
    // off event_id) so both engines build the identical table.
    "q_v_intervals" -> ((s, dir) =>
      Intervals.validity(t(s, dir, "events"),
        IntervalKeySql, IntervalFromSql, IntervalToSql, "event_id",
        gapTolUs = IntervalGapTolUs)),

    // ECF drift (Epps–Singleton characteristic-function two-sample
    // test, unweighted): Σ_j |φ_A(t_j) − φ_B(t_j)|² over a fixed
    // frequency grid — frequency-domain drift beside chi²/KS/PSI/EMD.
    // State is grid-sized (4·J counters), one scan, algebraic merge.
    "q_v_drift_ecf" -> ((s, dir) =>
      StatChecks.ecfTwoSample(t(s, dir, "orders"), "o_totalprice",
        AnomalyBaselineWhere, scale = EcfScale, freqs = EcfFreqs)),

    // Inclusion-dependency discovery (SINDY shape) across the TPC-H key
    // columns — recovers the FK graph with no schema hints; lhs ⊆ rhs
    // iff every distinct lhs value co-occurs with rhs.
    "q_v_inclusion" -> ((s, dir) =>
      validation.Inclusion.inds(n => t(s, dir, n),
        validation.Inclusion.TestdataKeyAttrs)),

    // Functional-dependency discovery (TANE semantics, aggregation
    // shape) across part's columns — the PK determines everything, no
    // non-key FD holds, and the oracle verifies BOTH outcomes plus the
    // per-pair evidence (det_ndv, max dep ndv per det group).
    "q_v_fds" -> ((s, dir) =>
      validation.FunctionalDeps.fds(t(s, dir, "part"), PartFdCols)),

    // Candidate-key discovery (UCC lattice, levels 1-2 with Apriori
    // pruning) over orders — finds the PK and the two genuinely minimal
    // unique pairs; completes the dependency-discovery trio with
    // q_v_inclusion (FKs) and q_v_fds (determinants).
    "q_v_uccs" -> ((s, dir) =>
      validation.UniqueCombos.uccs(t(s, dir, "orders"), OrdersUccCols)),

    // Quarantine side of the one-pass split: failing rows with their
    // comma-joined violation labels (pure projection + filter, no shuffle;
    // oracle generated from the same row predicates).
    "q_v_quarantine" -> ((s, dir) =>
      lineitemRowSuite.split(t(s, dir, "lineitem"))._2
        .select("l_orderkey", "l_linenumber", "violations")
        .orderBy("l_orderkey", "l_linenumber")),

    // Bounded violation EXAMPLES: first 5 failing rows per check in key
    // order via the distributed two-stage top-k (per-input-partition
    // pre-rank, then re-rank the survivors) — a red verdict's triage
    // attachment without ever funneling a check's full failing set
    // through one reducer.
    "q_v_examples" -> ((s, dir) =>
      lineitemRowSuite.exampleViolations(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), k = 5)),

    // Sample-based validation estimate: the same row checks over a 2/16
    // deterministic md5-prefix sample, each check's full-table violation
    // rate bounded by a Wilson 95% interval — the 10^12-row triage pass
    // that tells you which checks are known-red/known-green before
    // paying the exact scan.
    "q_v_estimate" -> ((s, dir) =>
      lineitemRowSuite.estimate(t(s, dir, "lineitem"),
        "l_orderkey * 10 + l_linenumber", Seq("0", "1"), maxViolRate = 0.1)),

    // Estimate-then-exact triage end-to-end: at budget 0.1 the sample
    // bounds decide complete_l_shipdate (known-green) and low_discount /
    // matches_l_returnflag (known-red) without a full scan; only
    // range_l_quantity's interval straddles the budget and pays the
    // exact pass — and that pass evaluates ONLY its predicate.
    "q_v_triage" -> ((s, dir) =>
      lineitemRowSuite.triage(t(s, dir, "lineitem"),
        "l_orderkey * 10 + l_linenumber", Seq("0", "1"), maxViolRate = 0.1)),

    // Uniqueness checks (salted two-stage) over three candidate keys.
    "q_v_uniqueness" -> ((s, dir) => {
      uniquenessVerdict(t(s, dir, "orders"), "pk_orders", Seq("o_orderkey"))
        .unionByName(uniquenessVerdict(t(s, dir, "lineitem"), "pk_lineitem",
          Seq("l_orderkey", "l_linenumber")))
        .unionByName(uniquenessVerdict(t(s, dir, "customer"), "pk_customer",
          Seq("c_custkey")))
        .orderBy("check")
    }),

    // Referential integrity: child→parent orphan counts.
    "q_v_referential" -> ((s, dir) => {
      referentialVerdict(t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey", "fk_lineitem_orders")
        .unionByName(referentialVerdict(t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey", "fk_lineitem_part"))
        .unionByName(referentialVerdict(t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey", "fk_orders_customer"))
        .orderBy("check")
    }),

    // Referential orphan LISTING through the Bloom-split exact anti-join
    // (BloomAntiJoin): probe rows the Bloom summary refutes bypass the
    // join shuffle, the maybe-slice is resolved exactly — same rows as a
    // plain NOT IN, proven by the oracle. Orders-without-lineitems is the
    // direction with real survivors in this corpus (~2% of orders); the
    // mostly-matched shape prunes little by design — the operator's
    // big-win shape is q_dedup_incr_bloom (new-vs-seen).
    "q_v_orphans_bloom" -> ((s, dir) => {
      BloomAntiJoin.antiJoin(
        t(s, dir, "orders").select("o_orderkey", "o_orderstatus"),
        t(s, dir, "lineitem"), "o_orderkey", "l_orderkey",
        expectedItems = 1000000L, fpp = 0.01)
        .orderBy("o_orderkey")
    }),

    // Column-stats verdict: single-pass multi-aggregate (null-rate, bounds,
    // exact distinct, exact interpolated median) — the "compute all stats in
    // ONE agg" batch-coalescing rewrite (SURVEY.md §4).
    "q_v_colstats" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("null_totalprice"),
        min(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("min_totalprice"),
        max(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("max_totalprice"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_totalprice"),
        countDistinct(col("o_custkey")).as("ndv_custkey"),
        min(col("o_orderdate")).cast("date").cast("string").as("min_date"),
        max(col("o_orderdate")).cast("date").cast("string").as("max_date"))
    }),

    // Shannon entropy of categorical columns (value-concentration
    // profile — 0 for a constant column, ln(ndv) for uniform; the
    // normalized form is scale-free so thresholds survive corpus
    // growth). One groupBy per column over counts that are exact
    // integer ratios; ln rides the same round-6 discipline as PSI.
    "q_v_entropy" -> ((s, dir) => {
      def one(df: DataFrame, c: String) = {
        val counts = df.groupBy(col(c)).agg(count(lit(1L)).as("cnt"))
        counts.agg(sum("cnt").as("n"), count(lit(1L)).as("ndv"),
            sum(col("cnt").cast("double") * log(col("cnt").cast("double"))).as("sclc"))
          .select(lit(c).as("column"), col("n"), col("ndv"),
            round(log(col("n").cast("double")) -
              col("sclc") / col("n").cast("double"), 6).as("entropy"),
            round((log(col("n").cast("double")) -
              col("sclc") / col("n").cast("double")) /
              log(col("ndv").cast("double")), 6).as("entropy_norm"))
      }
      one(t(s, dir, "events"), "event_type")
        .unionAll(one(t(s, dir, "orders"), "o_orderstatus"))
        .unionAll(one(t(s, dir, "lineitem"), "l_returnflag"))
        .orderBy("column")
    }),

    // Cross-column Pearson correlation profile: all three pairs over
    // lineitem's numeric columns from ONE aggregation pass (the
    // correlation analyzer of published data-quality suites). The nine
    // moments ride exact decimal sums (order-free across any shuffle);
    // the final r = (n·Sxy − Sx·Sy)/(√(n·Sxx − Sx²)·√(n·Syy − Sy²)) is
    // the same scalar double expression in both engines, rounded.
    "q_v_corr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def m1(c: String) = sum(col(c).cast("decimal(28,6)"))
      def m2(x: String, y: String) =
        sum((col(x) * col(y)).cast("decimal(38,10)"))
      val a = li.agg(
        count(lit(1L)).as("n"),
        m1("l_quantity").as("s_q"), m1("l_extendedprice").as("s_p"),
        m1("l_discount").as("s_d"),
        m2("l_quantity", "l_quantity").as("s_qq"),
        m2("l_extendedprice", "l_extendedprice").as("s_pp"),
        m2("l_discount", "l_discount").as("s_dd"),
        m2("l_quantity", "l_extendedprice").as("s_qp"),
        m2("l_quantity", "l_discount").as("s_qd"),
        m2("l_extendedprice", "l_discount").as("s_pd"))
      def corr(sxy: String, sx: String, sy: String,
               sxx: String, syy: String) = {
        val n = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        round((n * d(sxy) - d(sx) * d(sy)) /
          (sqrt(n * d(sxx) - d(sx) * d(sx)) *
           sqrt(n * d(syy) - d(sy) * d(sy))), 6)
      }
      a.select(col("n").as("n_rows"),
        corr("s_qp", "s_q", "s_p", "s_qq", "s_pp").as("corr_qty_price"),
        corr("s_qd", "s_q", "s_d", "s_qq", "s_dd").as("corr_qty_disc"),
        corr("s_pd", "s_p", "s_d", "s_pp", "s_dd").as("corr_price_disc"))
    }),

    // Mutual information between orders' two categorical columns —
    // [[validation.Analyzers.mutualInfo]] (entropy composition
    // MI = H(x) + H(y) − H(x,y), one corpus scan); the oracle restates
    // the same formula over the same joint-counts CTE. Both columns
    // are profiler-proved low-NDV, so the joint frame stays tiny.
    "q_v_mutual_info" -> ((s, dir) =>
      validation.Analyzers.mutualInfo(t(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")),

    // Order invariant over events: per user, ts must be non-decreasing
    // in event_id order (event_id is unique, so the order is total and
    // both engines see identical neighbor pairs) —
    // [[validation.Analyzers.orderInvariant]].
    "q_v_monotonic" -> ((s, dir) =>
      validation.Analyzers.orderInvariant(t(s, dir, "events"),
        key = "user_id", ord = "event_id", value = "ts")),

    // Relationship-cardinality profiling of the three FK edges the
    // inclusion sweep discovers —
    // Vector-column sanity over the embeddings table: dim uniformity,
    // nulls, non-finite components, zero vectors, L2-norm envelope —
    // one codegen'd projection + one scalar aggregation; fold order and
    // double-widening matched to the DuckDB twin bit-for-bit.
    "q_v_embeddings" -> ((s, dir) =>
      validation.Analyzers.embeddingSanity(t(s, dir, "embeddings"),
        "embedding", normLo = 0.999, normHi = 1.001)),

    // [[validation.Analyzers.relationshipCardinality]] classifies each
    // edge 1:1 / N:1 / N:M from the max key multiplicity per side.
    "q_v_rel_cardinality" -> ((s, dir) => {
      validation.Analyzers.relationshipCardinality(
          "lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey")
        .unionByName(validation.Analyzers.relationshipCardinality(
          "lineitem.l_partkey->part.p_partkey",
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"))
        .unionByName(validation.Analyzers.relationshipCardinality(
          "orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"))
        .orderBy("rel")
    }),

    // Row-invariant bounds + sentinel checks in one pass over lineitem —
    // bounds predicate (P3) + sentinel predicate (P4) verdicts.
    "q_v_row_invariants" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1).otherwise(0)).as("bad_quantity"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1).otherwise(0)).as("bad_discount"),
        sum(when(col("l_tax") < 0.0, 1).otherwise(0)).as("bad_tax"),
        sum(when(col("l_extendedprice") <= 0.0, 1).otherwise(0)).as("bad_price"),
        sum(when(col("l_quantity") === 0.0 && col("l_extendedprice") === 0.0, 1).otherwise(0)).as("sentinel_rows"))
    }),

    // V1/V8 oracle twin: graded 1.0/0.8/0.6/0.2 score ladders over exact
    // violation rates + overall score = mean of sub-scores (reference
    // bucket shape validation_agent.py:742-750, composition 422-424).
    // Rates are exact integer ratios; the ladder compares and the final
    // mean are identical FP ops in both engines.
    "q_v_scores" -> ((s, dir) => {
      val agg = t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 48, 1L).otherwise(0L)).as("n_hi_qty"),
        sum(when(col("l_discount") > 0.09, 1L).otherwise(0L)).as("n_hi_disc"),
        sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)).as("n_bad_price"))
      def rate(c: String) = col(c).cast("double") / col("n_rows").cast("double")
      val sq = Scoring.rateScore(rate("n_hi_qty"))
      val sd = Scoring.rateScore(rate("n_hi_disc"))
      val sp = Scoring.rateScore(rate("n_bad_price"))
      agg.select(col("l_returnflag"),
          sq.as("score_quantity"), sd.as("score_discount"), sp.as("score_price"),
          ((sq + sd + sp) / 3.0).as("overall_score"))
        .orderBy("l_returnflag")
    }),

    // Distribution drift, chi-square: purchase vs view value histograms.
    // Integer bucket counts → exact doubles; identical formula order both
    // engines. The graft twin of compatibility/prior checks (V10).
    "q_v_drift_chisq" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(floor(col("value") / 50.0).as("bucket")).agg(count(lit(1)).as("obs_p"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(floor(col("value") / 50.0).as("bucket")).agg(count(lit(1)).as("obs_v"))
      val joined = p.join(v, Seq("bucket"), "inner")
      val totals = joined.agg(sum("obs_p").as("tot_p"), sum("obs_v").as("tot_v"))
      joined.crossJoin(totals)
        .withColumn("e_p", col("tot_p").cast("double") * col("obs_v").cast("double") / col("tot_v").cast("double"))
        .withColumn("term", (col("obs_p").cast("double") - col("e_p")) * (col("obs_p").cast("double") - col("e_p")) / col("e_p"))
        .agg(count(lit(1)).as("n_buckets"), round(sum(col("term")), 6).as("chi2"))
    }),

    // Distribution drift, PSI (population stability index): the
    // industry-standard banded drift score Σ (p_i − q_i)·ln(p_i/q_i)
    // over the shared bucket grid — complements chi² (count-scale
    // sensitive) and KS (max-deviation) with a symmetric, proportion-
    // scale score. Inner join keeps only common buckets so every term
    // is finite (the smoothing-free variant both engines state
    // identically); ln is the only transcendental and round(…,6)
    // absorbs the <1-ulp libm spread between JVM and DuckDB.
    "q_v_drift_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(floor(col("value") / 50.0).as("bucket")).agg(count(lit(1)).as("obs_p"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(floor(col("value") / 50.0).as("bucket")).agg(count(lit(1)).as("obs_v"))
      val joined = p.join(v, Seq("bucket"), "inner")
      val totals = joined.agg(sum("obs_p").as("tot_p"), sum("obs_v").as("tot_v"))
      joined.crossJoin(totals)
        .withColumn("pp", col("obs_p").cast("double") / col("tot_p").cast("double"))
        .withColumn("pv", col("obs_v").cast("double") / col("tot_v").cast("double"))
        .withColumn("term", (col("pp") - col("pv")) * log(col("pp") / col("pv")))
        .agg(count(lit(1)).as("n_buckets"), round(sum(col("term")), 6).as("psi"))
    }),

    // Segmented drift attribution: WHICH segment drifted, not just
    // whether anything did — per-event_type chi² vs the corpus value
    // distribution via Drift.segmentedChiSq (one scan, one (segment,
    // bucket) shuffle, corpus histogram derived from the segment
    // histogram). On this synthetic tier every type draws from the same
    // distribution, so the honest verdict is all-false; the planted-
    // drift detection twin is SegmentedDriftSpec.
    "q_v_drift_segmented" -> ((s, dir) =>
      validation.Drift.segmentedChiSq(
        t(s, dir, "events"), "event_type", "value",
        bucketWidth = 50.0, threshold = SegDriftThreshold)),

    // Distribution drift, KS statistic: max |CDF_a − CDF_b| over the bucket
    // grid; CDFs are exact integer ratios so the max is exact. The cumsum
    // is a triangular theta-join over the POST-AGGREGATION bucket grid (a
    // bounded few-dozen rows — value/10 buckets), NOT a global window: an
    // unpartitioned window funnels its input through one task, and even a
    // harmless one on tiny input spams `WindowExec: No Partition Defined`.
    // For unbounded grids the production path is Drift.check's mergeable
    // sketches with driver/executor CDF finalize.
    "q_v_drift_ks" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val b = ev.filter(col("event_type").isin("purchase", "view"))
        .groupBy(floor(col("value") / 10.0).as("bucket"))
        .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("c_p"),
             sum(when(col("event_type") === "view", 1).otherwise(0)).as("c_v"))
      val cum = b.as("x").join(b.select(col("bucket").as("y_bucket"),
            col("c_p").as("y_c_p"), col("c_v").as("y_c_v")),
          col("y_bucket") <= col("x.bucket"))
        .groupBy(col("x.bucket").as("bucket"))
        .agg(sum("y_c_p").as("cum_p"), sum("y_c_v").as("cum_v"))
      val tot = b.agg(sum("c_p").as("tot_p"), sum("c_v").as("tot_v"))
      cum.crossJoin(tot)
        .withColumn("diff", abs(col("cum_p").cast("double") / col("tot_p").cast("double") -
          col("cum_v").cast("double") / col("tot_v").cast("double")))
        .agg(round(max(col("diff")), 6).as("ks"), count(lit(1)).as("n_buckets"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_v_checksuite" -> ordersSuite.duckSql("orders"),
    "q_v_checksuite_grouped" ->
      ordersSuiteGrouped.duckSql("orders", Seq("o_orderstatus")),
    "q_v_quarantine" ->
      lineitemRowSuite.duckQuarantineSql("lineitem",
        Seq("l_orderkey", "l_linenumber")),
    "q_v_examples" ->
      lineitemRowSuite.duckExamplesSql("lineitem",
        Seq("l_orderkey", "l_linenumber"), k = 5),
    "q_v_estimate" ->
      lineitemRowSuite.duckEstimateSql("lineitem",
        "l_orderkey * 10 + l_linenumber", Seq("0", "1"), maxViolRate = 0.1),
    "q_v_triage" ->
      lineitemRowSuite.duckTriageSql("lineitem",
        "l_orderkey * 10 + l_linenumber", Seq("0", "1"), maxViolRate = 0.1),
    "q_v_anomaly" ->
      validation.MetricAnomaly.duckSql(ordersSuite, "orders",
        AnomalyBaselineWhere, maxAbsDelta = 0.001, maxRelDelta = 0.05),
    "q_v_trend" -> validation.MetricTrend.duckSql(
      ordersSuiteGrouped.duckSql(
        "(SELECT *, CAST(year(o_orderdate) AS VARCHAR) AS run_id FROM orders)",
        Seq("run_id")),
      lam = 0.3, l = 3.0, baselineRuns = 4),
    "q_v_cusum" -> validation.MetricTrend.duckCusumSql(
      ordersSuiteGrouped.duckSql(
        "(SELECT *, CAST(year(o_orderdate) AS VARCHAR) AS run_id FROM orders)",
        Seq("run_id")),
      k = 0.5, h = 4.0, baselineRuns = 4),
    "q_v_profile" -> Profiler.duckProfileSql("orders", OrdersProfileCols),
    "q_v_suggest" -> Profiler.duckSuggestSql("events", EventsProfileCols),
    "q_v_corr_matrix" -> Profiler.duckCorrelationsSql("lineitem", CorrCols),
    "q_v_spearman" -> Profiler.duckSpearmanSql("lineitem", CorrCols),
    "q_v_benford" -> StatChecks.duckBenfordSql("lineitem", "l_extendedprice"),
    "q_v_independence" -> StatChecks.duckIndependenceSql("orders",
      "o_orderstatus", "o_orderpriority", critical = 15.507),
    "q_v_mi" -> StatChecks.duckMutualInfoSql("orders",
      "o_orderstatus", "o_orderpriority"),
    "q_v_ks_exact" -> StatChecks.duckKsTwoSampleSql("orders",
      "o_totalprice", AnomalyBaselineWhere),
    "q_v_theilsen" -> validation.MetricTrend.duckTheilSenSql(
      ordersSuiteGrouped.duckSql(
        "(SELECT *, CAST(year(o_orderdate) AS VARCHAR) AS run_id FROM orders)",
        Seq("run_id")),
      slopeTol = 0.01),
    "q_v_masks" -> MaskProfile.duckMasksSql("documents",
      "substr(text, 1, 16)", topK = 20),
    "q_v_outliers_ecod" -> StatChecks.duckEcodSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_orderkey", "l_linenumber"), topK = 100),
    "q_v_outliers_ecod_grid" -> StatChecks.duckEcodGridSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_orderkey", "l_linenumber"), gridN = 255, topK = 100),
    "q_v_outliers_mad" -> StatChecks.duckRobustOutliersSql("events", "value"),
    "q_v_outliers_mahalanobis" -> StatChecks.duckMahalanobisSql(
      """(SELECT o_orderkey,
           CAST(coalesce(cnt, 0) AS DOUBLE) AS n_items,
           CAST(o_totalprice AS DOUBLE) AS total_price
         FROM orders LEFT JOIN (SELECT l_orderkey AS k, count(*) AS cnt
             FROM lineitem GROUP BY 1) li ON o_orderkey = k)""",
      "n_items", "total_price", Seq("o_orderkey")),
    "q_v_freshness" -> Timeliness.duckFreshnessSql("events", "ts",
      "event_type", "2024-02-01 00:00:00", maxLagHours = 36.0,
      maxGapHours = 4.0),
    "q_v_embeddings" -> validation.Analyzers.duckEmbeddingSanitySql(
      "embeddings", "embedding", normLo = 0.999, normHi = 1.001),
    "q_v_intervals" -> Intervals.duckValiditySql("events",
      IntervalKeySql, DuckIntervalFromSql, DuckIntervalToSql, "event_id",
      gapTolUs = IntervalGapTolUs),
    "q_v_drift_ecf" -> StatChecks.duckEcfTwoSampleSql("orders",
      "o_totalprice", AnomalyBaselineWhere, scale = EcfScale,
      freqs = EcfFreqs),
    "q_v_inclusion" ->
      validation.Inclusion.duckSql(validation.Inclusion.TestdataKeyAttrs),
    "q_v_fds" -> validation.FunctionalDeps.duckSql("part", PartFdCols),
    "q_v_uccs" -> validation.UniqueCombos.duckSql("orders", OrdersUccCols),
    "q_v_entropy" -> {
      def one(table: String, c: String) =
        s"""SELECT '$c' AS "column", n, ndv,
           round(ln(CAST(n AS DOUBLE)) - sclc / CAST(n AS DOUBLE), 6) AS entropy,
           round((ln(CAST(n AS DOUBLE)) - sclc / CAST(n AS DOUBLE))
             / ln(CAST(ndv AS DOUBLE)), 6) AS entropy_norm
           FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS ndv,
                   sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS sclc
                 FROM (SELECT $c, count(*) AS cnt FROM $table GROUP BY $c))"""
      Seq(one("events", "event_type"), one("orders", "o_orderstatus"),
        one("lineitem", "l_returnflag"))
        .mkString("", "\n UNION ALL\n ", "\n ORDER BY \"column\"")
    },
    "q_v_corr" ->
      """WITH a AS (
           SELECT count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(28,6))) AS s_q,
             sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS s_p,
             sum(CAST(l_discount AS DECIMAL(28,6))) AS s_d,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS s_qq,
             sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS s_pp,
             sum(CAST(l_discount * l_discount AS DECIMAL(38,10))) AS s_dd,
             sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS s_qp,
             sum(CAST(l_quantity * l_discount AS DECIMAL(38,10))) AS s_qd,
             sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))) AS s_pd
           FROM lineitem)
         SELECT n AS n_rows,
           round((CAST(n AS DOUBLE) * CAST(s_qp AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_p AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))), 6) AS corr_qty_price,
           round((CAST(n AS DOUBLE) * CAST(s_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))), 6) AS corr_qty_disc,
           round((CAST(n AS DOUBLE) * CAST(s_pd AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_d AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))), 6) AS corr_price_disc
         FROM a""",
    "q_v_drift_psi" ->
      """WITH p AS (
           SELECT floor(value/50.0) AS bucket, count(*) AS obs_p
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         v AS (
           SELECT floor(value/50.0) AS bucket, count(*) AS obs_v
           FROM events WHERE event_type = 'view' GROUP BY 1),
         j AS (SELECT p.bucket, obs_p, obs_v FROM p JOIN v ON p.bucket = v.bucket),
         tot AS (SELECT sum(obs_p) AS tot_p, sum(obs_v) AS tot_v FROM j),
         terms AS (
           SELECT (CAST(obs_p AS DOUBLE)/CAST(tot_p AS DOUBLE)
                 - CAST(obs_v AS DOUBLE)/CAST(tot_v AS DOUBLE))
                * ln((CAST(obs_p AS DOUBLE)/CAST(tot_p AS DOUBLE))
                   / (CAST(obs_v AS DOUBLE)/CAST(tot_v AS DOUBLE))) AS term
           FROM j, tot)
         SELECT count(*) AS n_buckets, round(sum(term), 6) AS psi FROM terms""",
    "q_v_uniqueness" ->
      """WITH g1 AS (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1),
         g2 AS (SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem GROUP BY 1, 2),
         g3 AS (SELECT c_custkey, count(*) AS n FROM customer GROUP BY 1),
         u AS (
           SELECT 'pk_orders' AS check, CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
             CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
             CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_extra_rows
           FROM g1
           UNION ALL
           SELECT 'pk_lineitem', CAST(sum(n) AS BIGINT), count(*),
             CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
           FROM g2
           UNION ALL
           SELECT 'pk_customer', CAST(sum(n) AS BIGINT), count(*),
             CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
           FROM g3)
         SELECT "check", n_rows, n_keys, n_dup_keys, n_extra_rows,
           n_dup_keys = 0 AS pass
         FROM u""",
    "q_v_referential" ->
      """SELECT 'fk_lineitem_orders' AS check,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans,
           (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0 AS pass
         UNION ALL
         SELECT 'fk_lineitem_part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)),
           (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) = 0
         UNION ALL
         SELECT 'fk_orders_customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
           (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0""",
    "q_v_orphans_bloom" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""",
    "q_v_colstats" ->
      """SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
         CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_totalprice,
         CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_totalprice,
         round(quantile_cont(o_totalprice, 0.5), 4) AS median_totalprice,
         count(DISTINCT o_custkey) AS ndv_custkey,
         strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
         strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
         FROM orders""",
    "q_v_row_invariants" ->
      """SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
         CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
         CAST(sum(CASE WHEN l_tax < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
         CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         CAST(sum(CASE WHEN l_quantity = 0.0 AND l_extendedprice = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS sentinel_rows
         FROM lineitem""",
    "q_v_scores" ->
      """WITH a AS (
           SELECT l_returnflag, count(*) AS n_rows,
             sum(CASE WHEN l_quantity > 48 THEN 1 ELSE 0 END) AS n_hi_qty,
             sum(CASE WHEN l_discount > 0.09 THEN 1 ELSE 0 END) AS n_hi_disc,
             sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS n_bad_price
           FROM lineitem GROUP BY 1),
         s AS (
           SELECT l_returnflag,
             CASE WHEN CAST(n_hi_qty AS DOUBLE)/n_rows = 0 THEN CAST(1.0 AS DOUBLE)
                  WHEN CAST(n_hi_qty AS DOUBLE)/n_rows <= 0.01 THEN CAST(0.8 AS DOUBLE)
                  WHEN CAST(n_hi_qty AS DOUBLE)/n_rows <= 0.05 THEN CAST(0.6 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) END AS score_quantity,
             CASE WHEN CAST(n_hi_disc AS DOUBLE)/n_rows = 0 THEN CAST(1.0 AS DOUBLE)
                  WHEN CAST(n_hi_disc AS DOUBLE)/n_rows <= 0.01 THEN CAST(0.8 AS DOUBLE)
                  WHEN CAST(n_hi_disc AS DOUBLE)/n_rows <= 0.05 THEN CAST(0.6 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) END AS score_discount,
             CASE WHEN CAST(n_bad_price AS DOUBLE)/n_rows = 0 THEN CAST(1.0 AS DOUBLE)
                  WHEN CAST(n_bad_price AS DOUBLE)/n_rows <= 0.01 THEN CAST(0.8 AS DOUBLE)
                  WHEN CAST(n_bad_price AS DOUBLE)/n_rows <= 0.05 THEN CAST(0.6 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) END AS score_price
           FROM a)
         SELECT l_returnflag, score_quantity, score_discount, score_price,
           (score_quantity + score_discount + score_price) / 3.0 AS overall_score
         FROM s""",
    "q_v_mutual_info" ->
      """WITH joint AS (
           SELECT o_orderstatus AS x, o_orderpriority AS y, count(*) AS c
           FROM orders GROUP BY 1, 2),
         sj AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS ndv_xy,
                  sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sj
                FROM joint),
         sx AS (SELECT count(*) AS ndv_x,
                  sum(CAST(cx AS DOUBLE) * ln(CAST(cx AS DOUBLE))) AS sx
                FROM (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM joint GROUP BY 1)),
         sy AS (SELECT count(*) AS ndv_y,
                  sum(CAST(cy AS DOUBLE) * ln(CAST(cy AS DOUBLE))) AS sy
                FROM (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM joint GROUP BY 1))
         SELECT n, ndv_x, ndv_y, ndv_xy,
           round(ln(CAST(n AS DOUBLE)) - sx / CAST(n AS DOUBLE), 6) AS h_x,
           round(ln(CAST(n AS DOUBLE)) - sy / CAST(n AS DOUBLE), 6) AS h_y,
           round(ln(CAST(n AS DOUBLE)) - sj / CAST(n AS DOUBLE), 6) AS h_xy,
           round((ln(CAST(n AS DOUBLE)) - sx / CAST(n AS DOUBLE))
               + (ln(CAST(n AS DOUBLE)) - sy / CAST(n AS DOUBLE))
               - (ln(CAST(n AS DOUBLE)) - sj / CAST(n AS DOUBLE)), 6) AS mi,
           round(((ln(CAST(n AS DOUBLE)) - sx / CAST(n AS DOUBLE))
               + (ln(CAST(n AS DOUBLE)) - sy / CAST(n AS DOUBLE))
               - (ln(CAST(n AS DOUBLE)) - sj / CAST(n AS DOUBLE)))
             / least(ln(CAST(n AS DOUBLE)) - sx / CAST(n AS DOUBLE),
                     ln(CAST(n AS DOUBLE)) - sy / CAST(n AS DOUBLE)), 6) AS mi_norm
         FROM sj, sx, sy""",
    "q_v_monotonic" ->
      """WITH l AS (
           SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
           FROM events)
         SELECT count(DISTINCT user_id) AS n_keys,
           count(prev_ts) AS n_pairs,
           CAST(sum(CASE WHEN prev_ts > ts THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
           CAST(sum(CASE WHEN prev_ts > ts THEN 1 ELSE 0 END) AS BIGINT) = 0 AS pass
         FROM l""",
    "q_v_rel_cardinality" -> {
      def edge(rel: String, child: String, ck: String,
               parent: String, pk: String) =
        s"""SELECT '$rel' AS rel,
             c.n_child, c.ndv_child, c.max_child_mult,
             p.n_parent, p.ndv_parent, p.max_parent_mult,
             CASE WHEN p.max_parent_mult > 1 THEN 'N:M'
                  WHEN c.max_child_mult > 1 THEN 'N:1'
                  ELSE '1:1' END AS cardinality
           FROM
             (SELECT count(*) AS ndv_child, CAST(sum(c) AS BIGINT) AS n_child,
                max(c) AS max_child_mult
              FROM (SELECT $ck, count(*) AS c FROM $child GROUP BY 1)) c,
             (SELECT count(*) AS ndv_parent, CAST(sum(c) AS BIGINT) AS n_parent,
                max(c) AS max_parent_mult
              FROM (SELECT $pk, count(*) AS c FROM $parent GROUP BY 1)) p"""
      Seq(
        edge("lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
        edge("orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"))
        .mkString("", "\n UNION ALL\n ", "\n ORDER BY rel")
    },
    "q_v_drift_chisq" ->
      """WITH p AS (
           SELECT floor(value/50.0) AS bucket, count(*) AS obs_p
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         v AS (
           SELECT floor(value/50.0) AS bucket, count(*) AS obs_v
           FROM events WHERE event_type = 'view' GROUP BY 1),
         j AS (SELECT p.bucket, obs_p, obs_v FROM p JOIN v ON p.bucket = v.bucket),
         tot AS (SELECT sum(obs_p) AS tot_p, sum(obs_v) AS tot_v FROM j),
         terms AS (
           SELECT (CAST(obs_p AS DOUBLE) - CAST(tot_p AS DOUBLE)*CAST(obs_v AS DOUBLE)/CAST(tot_v AS DOUBLE))
                * (CAST(obs_p AS DOUBLE) - CAST(tot_p AS DOUBLE)*CAST(obs_v AS DOUBLE)/CAST(tot_v AS DOUBLE))
                / (CAST(tot_p AS DOUBLE)*CAST(obs_v AS DOUBLE)/CAST(tot_v AS DOUBLE)) AS term
           FROM j, tot)
         SELECT count(*) AS n_buckets, round(sum(term), 6) AS chi2 FROM terms""",
    "q_v_drift_segmented" ->
      s"""WITH seg AS (
            SELECT event_type AS segment, floor(value / 50.0) AS bucket,
              count(*) AS obs
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          corpus AS (
            SELECT bucket, CAST(sum(obs) AS BIGINT) AS corpus_cnt
            FROM seg GROUP BY 1),
          corpus_tot AS (
            SELECT CAST(sum(corpus_cnt) AS BIGINT) AS corpus_tot FROM corpus),
          seg_tot AS (
            SELECT segment, CAST(sum(obs) AS BIGINT) AS seg_tot
            FROM seg GROUP BY 1),
          grid AS (
            SELECT st.segment, c.bucket, st.seg_tot, c.corpus_cnt,
              coalesce(s.obs, 0) AS obs
            FROM seg_tot st CROSS JOIN corpus c
            LEFT JOIN seg s ON s.segment = st.segment AND s.bucket = c.bucket),
          terms AS (
            SELECT segment,
              (CAST(obs AS DOUBLE)
                 - CAST(seg_tot AS DOUBLE) * CAST(corpus_cnt AS DOUBLE) / CAST(corpus_tot AS DOUBLE))
              * (CAST(obs AS DOUBLE)
                 - CAST(seg_tot AS DOUBLE) * CAST(corpus_cnt AS DOUBLE) / CAST(corpus_tot AS DOUBLE))
              / (CAST(seg_tot AS DOUBLE) * CAST(corpus_cnt AS DOUBLE) / CAST(corpus_tot AS DOUBLE))
                AS term
            FROM grid CROSS JOIN corpus_tot)
          SELECT segment, count(*) AS n_buckets,
            round(sum(term), 6) AS chi2,
            round(sum(term), 6) / count(*) > $SegDriftThreshold AS drifted
          FROM terms GROUP BY segment""",
    "q_v_drift_ks" ->
      """WITH b AS (
           SELECT floor(value/10.0) AS bucket,
             sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS c_p,
             sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS c_v
           FROM events WHERE event_type IN ('purchase','view') GROUP BY 1),
         c AS (
           SELECT bucket,
             sum(c_p) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
             sum(c_v) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v
           FROM b),
         tot AS (SELECT sum(c_p) AS tot_p, sum(c_v) AS tot_v FROM b)
         SELECT round(max(abs(CAST(cum_p AS DOUBLE)/CAST(tot_p AS DOUBLE)
                    - CAST(cum_v AS DOUBLE)/CAST(tot_v AS DOUBLE))), 6) AS ks,
           count(*) AS n_buckets
         FROM c, tot"""
  )
}
