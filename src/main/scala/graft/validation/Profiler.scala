package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler + constraint suggestion — the DISCOVERY
  * face of the constraint engine: profile a table you've never seen,
  * then turn the profile into a runnable [[CheckSuite]] (the published
  * profile→suggest→verify loop of data-quality systems; re-derived here
  * as one Catalyst aggregation + a deterministic rule ladder).
  *
  * Reference semantics: the per-field statistics the validation agent
  * accumulates before judging records (null rates, observed ranges,
  * category sets — `/root/reference/src/crawl_first/validation_agent.py:
  * 258-305`), lifted to a declarative one-pass plan.
  *
  * Scale shape (100 TB): the profile is ONE aggregation over the table —
  * algebraic counters per column, map-side partials, a single-row
  * exchange — same as [[CheckSuite.run]]. The exact-NDV rung plans one
  * Expand ×(#columns) (documented, the oracle rung); `exactNdv = false`
  * swaps every distinct count for a mergeable HLL sketch
  * (approx_count_distinct, no Expand) — the 10^12-row default.
  * Suggestion pass 2 (category values) only ever scans columns pass 1
  * PROVED low-cardinality, so its collect_set state is bounded by
  * `inSetMaxNdv` values per column.
  *
  * Determinism discipline (cross-engine hash contract): counts and
  * count ratios are integers or integer ratios; numeric min/max/sums
  * ride decimal(28,6)/decimal(38,10) (exact, order-free) and convert to
  * double only in the final scalar expression; timestamps format to
  * strings; stddev derives from the decimal sums in one shared formula.
  */
object Profiler {

  /** Engine-neutral column kind. */
  sealed trait Kind { def label: String }
  case object Integral extends Kind { val label = "integral" }
  case object Fractional extends Kind { val label = "fractional" }
  case object Str extends Kind { val label = "string" }
  case object TimeLike extends Kind { val label = "timestamp" }

  def kindOf(dt: DataType): Option[Kind] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(Integral)
    case FloatType | DoubleType | _: DecimalType => Some(Fractional)
    case StringType => Some(Str)
    case DateType | TimestampType | TimestampNTZType => Some(TimeLike)
    case _ => None
  }

  /** (name, kind) for every profileable column of `df`. */
  def columnsOf(df: DataFrame): Seq[(String, Kind)] =
    df.schema.fields.flatMap(f => kindOf(f.dataType).map(f.name -> _)).toSeq

  private def a(c: String, suffix: String): String =
    c.replaceAll("[^A-Za-z0-9]", "_") + "_" + suffix

  /** One profile row per column:
    * (column, dtype, n_rows, n_nonnull, completeness, ndv, distinctness,
    *  min_num, max_num, mean_num, stddev_num, min_len, max_len,
    *  min_ts, max_ts, n_nonfinite) — numeric fields null for non-numeric
    * kinds etc.; NaN/±Inf are excluded from numeric stats and counted in
    * n_nonfinite. CALLER NOTE for hash-like longs (e.g. 64-bit phash):
    * project them out or profile them as strings — their squares exceed
    * decimal(38,10) and their mean/stddev is meaningless anyway.
    */
  def profile(df: DataFrame, exactNdv: Boolean = true): DataFrame = {
    val cols = columnsOf(df)
    require(cols.nonEmpty, "no profileable columns")
    val aggs = count(lit(1L)).as("n") +: cols.flatMap { case (c, k) =>
      val base = Seq(
        count(col(c)).as(a(c, "nn")),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(a(c, "ndv")))
      val typed = k match {
        case Integral | Fractional =>
          // numeric stats are FINITE-only: NaN/±Inf (sensor sentinels,
          // division artifacts — e.g. the image suite's psnr_db = +Inf on
          // perfect reconstruction) would poison every decimal sum and
          // diverge across engines; they are excluded here and surfaced
          // in n_nonfinite instead
          val d0 = col(c).cast("double")
          val d = when(!isnan(d0) && abs(d0) =!= lit(Double.PositiveInfinity), d0)
          Seq(
            count(d).as(a(c, "fc")),
            min(d.cast("decimal(28,6)")).as(a(c, "mn")),
            max(d.cast("decimal(28,6)")).as(a(c, "mx")),
            sum(d.cast("decimal(28,6)")).as(a(c, "s1")),
            sum((d * d).cast("decimal(38,10)")).as(a(c, "s2")))
        case Str =>
          Seq(min(length(col(c)).cast("long")).as(a(c, "ln")),
            max(length(col(c)).cast("long")).as(a(c, "lx")))
        case TimeLike =>
          val ts = col(c).cast("timestamp")
          Seq(date_format(min(ts), "yyyy-MM-dd HH:mm:ss").as(a(c, "tmn")),
            date_format(max(ts), "yyyy-MM-dd HH:mm:ss").as(a(c, "tmx")))
      }
      base ++ typed
    }
    val nullD = lit(null).cast("double")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val rows = cols.map { case (c, k) =>
      val nn = col(a(c, "nn"))
      val ndv = col(a(c, "ndv"))
      val (mnN, mxN, mean, sd, nonfin) = k match {
        case Integral | Fractional =>
          val fc = col(a(c, "fc"))
          val s1 = col(a(c, "s1")).cast("double")
          val s2 = col(a(c, "s2")).cast("double")
          val mean = round(s1 / fc, 4)
          // sample stddev from exact decimal sums; shared scalar formula
          val sd = when(fc >= 2,
            round(sqrt(greatest((s2 - s1 * s1 / fc) / (fc - 1), lit(0.0))), 4))
          (col(a(c, "mn")).cast("double"), col(a(c, "mx")).cast("double"),
            when(fc >= 1, mean), sd, nn - fc)
        case _ => (nullD, nullD, nullD, nullD, nullL)
      }
      val (ln, lx) = k match {
        case Str => (col(a(c, "ln")), col(a(c, "lx")))
        case _ => (nullL, nullL)
      }
      val (tmn, tmx) = k match {
        case TimeLike => (col(a(c, "tmn")), col(a(c, "tmx")))
        case _ => (nullS, nullS)
      }
      struct(
        lit(c).as("column"), lit(k.label).as("dtype"),
        col("n").as("n_rows"), nn.as("n_nonnull"),
        round(nn.cast("double") / col("n"), 6).as("completeness"),
        ndv.as("ndv"),
        round(ndv.cast("double") / col("n"), 6).as("distinctness"),
        mnN.as("min_num"), mxN.as("max_num"),
        mean.as("mean_num"), sd.as("stddev_num"),
        ln.as("min_len"), lx.as("max_len"),
        tmn.as("min_ts"), tmx.as("max_ts"),
        nonfin.as("n_nonfinite"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("column")
  }

  /** DuckDB twin of [[profile]] (exact-NDV rung) over `table` with the
    * SAME static column/kind list — generated, so formulas cannot drift. */
  def duckProfileSql(table: String, cols: Seq[(String, Kind)]): String = {
    val aggs = "count(*) AS n" +: cols.flatMap { case (c, k) =>
      val base = Seq(s"count($c) AS ${a(c, "nn")}",
        s"count(DISTINCT $c) AS ${a(c, "ndv")}")
      val typed = k match {
        case Integral | Fractional =>
          val ff = s"(CASE WHEN isfinite(CAST($c AS DOUBLE)) THEN CAST($c AS DOUBLE) END)"
          Seq(
            s"count($ff) AS ${a(c, "fc")}",
            s"min(CAST($ff AS DECIMAL(28,6))) AS ${a(c, "mn")}",
            s"max(CAST($ff AS DECIMAL(28,6))) AS ${a(c, "mx")}",
            s"sum(CAST($ff AS DECIMAL(28,6))) AS ${a(c, "s1")}",
            s"sum(CAST($ff * $ff AS DECIMAL(38,10))) AS ${a(c, "s2")}")
        case Str => Seq(
          s"min(length($c)) AS ${a(c, "ln")}",
          s"max(length($c)) AS ${a(c, "lx")}")
        case TimeLike => Seq(
          s"strftime(min($c), '%Y-%m-%d %H:%M:%S') AS ${a(c, "tmn")}",
          s"strftime(max($c), '%Y-%m-%d %H:%M:%S') AS ${a(c, "tmx")}")
      }
      base ++ typed
    }
    val arms = cols.map { case (c, k) =>
      val nn = a(c, "nn")
      val (mnN, mxN, mean, sd, nonfin) = k match {
        case Integral | Fractional =>
          val fc = a(c, "fc")
          val s1 = s"CAST(${a(c, "s1")} AS DOUBLE)"
          val s2 = s"CAST(${a(c, "s2")} AS DOUBLE)"
          (s"CAST(${a(c, "mn")} AS DOUBLE)", s"CAST(${a(c, "mx")} AS DOUBLE)",
            s"CASE WHEN $fc >= 1 THEN round($s1 / $fc, 4) END",
            s"CASE WHEN $fc >= 2 THEN round(sqrt(greatest(($s2 - $s1 * $s1 / $fc) / ($fc - 1), 0.0)), 4) END",
            s"$nn - $fc")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS BIGINT)")
      }
      val (ln, lx) = k match {
        case Str => (a(c, "ln"), a(c, "lx"))
        case _ => ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
      }
      val (tmn, tmx) = k match {
        case TimeLike => (a(c, "tmn"), a(c, "tmx"))
        case _ => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT '$c' AS "column", '${k.label}' AS dtype, n AS n_rows,
         $nn AS n_nonnull, round(CAST($nn AS DOUBLE) / n, 6) AS completeness,
         ${a(c, "ndv")} AS ndv,
         round(CAST(${a(c, "ndv")} AS DOUBLE) / n, 6) AS distinctness,
         $mnN AS min_num, $mxN AS max_num, $mean AS mean_num,
         $sd AS stddev_num, $ln AS min_len, $lx AS max_len,
         $tmn AS min_ts, $tmx AS max_ts, $nonfin AS n_nonfinite FROM prof"""
    }
    s"""WITH prof AS (SELECT ${aggs.mkString(",\n      ")} FROM $table)
       ${arms.mkString("\n  UNION ALL\n  ")}
       ORDER BY "column""""
  }

  /** Constraint suggestions from a profile — deterministic rule ladder,
    * one row per (column, check) with typed params:
    *   complete  — observed completeness (1.0 exact, else floored to a
    *               0.05 grid; only when ≥ 0.5)
    *   unique    — fully distinct AND fully complete
    *   in_range  — numeric: [floor(min), ceil(max)]
    *   in_set    — string with ndv ≤ `inSetMaxNdv`: the sorted value set
    *   str_len   — other strings: observed max length
    * Output: (column, check, p_lo, p_hi, p_ratio, p_values).
    */
  def suggest(df: DataFrame, exactNdv: Boolean = true,
              inSetMaxNdv: Int = 10): DataFrame = {
    val p = profile(df, exactNdv).localCheckpoint() // tiny: one row per column
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def arm(filter: Column, check: String, lo: Column, hi: Column,
            ratio: Column, values: Column): DataFrame =
      p.filter(filter).select(col("column"), lit(check).as("check"),
        lo.as("p_lo"), hi.as("p_hi"), ratio.as("p_ratio"),
        values.as("p_values"))
    // pass 2: category values, only for columns pass 1 proved small
    val candidates = p.filter(col("dtype") === Str.label &&
        col("ndv") <= inSetMaxNdv)
      .select("column").collect().map(_.getString(0)).sorted
    val valuesDf =
      if (candidates.isEmpty)
        p.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("column", StringType),
            StructField("vals", StringType))))
      else {
        val aggs = candidates.map(c =>
          array_join(array_sort(collect_set(col(c))), "|").as(c))
        val one = df.agg(aggs.head, aggs.tail: _*)
        candidates.map(c => one.select(lit(c).as("column"),
          col(c).as("vals"))).reduce(_.unionAll(_))
      }
    val complete = arm(col("completeness") >= 0.5, "complete", nullD, nullD,
      when(col("completeness") === 1.0, 1.0)
        .otherwise(floor(col("completeness") * 20) / 20), nullS)
    val unique = arm(col("distinctness") === 1.0 && col("completeness") === 1.0,
      "unique", nullD, nullD, nullD, nullS)
    // ratio = completeness: the profile proves every NON-NULL value lies
    // in [min,max], so in-range fraction == completeness on the source —
    // suggesting 1.0 on a nullable column would fail its own table
    // min_num null ⇔ zero finite values — nothing rangeable to suggest
    val inRange = arm(col("dtype").isin(Integral.label, Fractional.label) &&
        col("min_num").isNotNull,
      "in_range", floor(col("min_num")).cast("double"),
      ceil(col("max_num")).cast("double"), col("completeness"), nullS)
    val inSet = p.filter(col("dtype") === Str.label && col("ndv") <= inSetMaxNdv)
      .join(valuesDf, "column")
      .select(col("column"), lit("in_set").as("check"), nullD.as("p_lo"),
        nullD.as("p_hi"), nullD.as("p_ratio"), col("vals").as("p_values"))
    val strLen = arm(col("dtype") === Str.label && col("ndv") > inSetMaxNdv,
      "str_len", nullD, col("max_len").cast("double"), nullD, nullS)
    complete.unionAll(unique).unionAll(inRange).unionAll(inSet).unionAll(strLen)
      .orderBy("column", "check")
  }

  /** DuckDB twin of [[suggest]] — the same ladder over the generated
    * profile CTE; in_set values come from one nested-distinct scalar
    * subquery per static string column, applied only when that profile
    * row qualifies (so the generated SQL stays total while the DATA
    * decides which arms fire, exactly like the Spark side). */
  def duckSuggestSql(table: String, cols: Seq[(String, Kind)],
                     inSetMaxNdv: Int = 10): String = {
    val profSql = duckProfileSql(table, cols)
    val valueCases = cols.collect { case (c, Str) =>
      s"""WHEN "column" = '$c' THEN (SELECT string_agg(v, '|' ORDER BY v)
         FROM (SELECT DISTINCT $c AS v FROM $table WHERE $c IS NOT NULL))"""
    }
    val valueExpr =
      if (valueCases.isEmpty) "CAST(NULL AS VARCHAR)"
      else s"CASE ${valueCases.mkString(" ")} END"
    s"""WITH p AS ($profSql)
       SELECT * FROM (
         SELECT "column", 'complete' AS "check", CAST(NULL AS DOUBLE) AS p_lo,
           CAST(NULL AS DOUBLE) AS p_hi,
           CASE WHEN completeness = 1.0 THEN 1.0
                ELSE floor(completeness * 20) / 20 END AS p_ratio,
           CAST(NULL AS VARCHAR) AS p_values
         FROM p WHERE completeness >= 0.5
         UNION ALL
         SELECT "column", 'unique', NULL, NULL, NULL, NULL
         FROM p WHERE distinctness = 1.0 AND completeness = 1.0
         UNION ALL
         SELECT "column", 'in_range', CAST(floor(min_num) AS DOUBLE),
           CAST(ceil(max_num) AS DOUBLE), completeness, NULL
         FROM p WHERE dtype IN ('integral', 'fractional') AND min_num IS NOT NULL
         UNION ALL
         SELECT "column", 'in_set', NULL, NULL, NULL, $valueExpr
         FROM p WHERE dtype = 'string' AND ndv <= $inSetMaxNdv
         UNION ALL
         SELECT "column", 'str_len', NULL, CAST(max_len AS DOUBLE), NULL, NULL
         FROM p WHERE dtype = 'string' AND ndv > $inSetMaxNdv)
       ORDER BY "column", "check""""
  }

  /** Materialize suggestions into a runnable [[CheckSuite]] — closes the
    * profile→suggest→verify loop (a suggested suite must PASS on the
    * table it was profiled from; ProfilerSpec pins that property). */
  def toSuite(suggestions: DataFrame): CheckSuite = {
    val checks = suggestions.collect().toSeq.flatMap { r =>
      val c = r.getString(0)
      r.getString(1) match {
        case "complete" => Some(Complete(c, r.getDouble(4)))
        case "unique" => Some(Unique(Seq(c)))
        case "in_range" =>
          Some(InRange(c, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        case "in_set" =>
          Some(InSet(c, r.getString(5).split('|').toSeq, 1.0))
        case "str_len" =>
          Some(Satisfies(s"len_$c", s"length($c) <= ${r.getDouble(3).toLong}", 1.0))
        case _ => None
      }
    }
    CheckSuite(checks)
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * profiler's cross-COLUMN face (deequ's Correlation analyzer shape):
    * for every pair x < y, pairwise-complete counters (n, Σx, Σy, Σxy,
    * Σx², Σy² over rows where BOTH values are non-null and finite) in
    * ONE aggregation pass, finalized to
    * r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)).
    *
    * Scale shape (100 TB): one scan, O(p²) algebraic counters of state
    * (p = #columns, never rows), map-side partials, a single-row
    * exchange — the [[profile]] contract extended to pairs. Sums ride
    * decimal(28,6)/decimal(38,10) (exact, order-free) so both engines
    * finalize the double formula from identical inputs; r is round-6.
    * Constant columns (zero variance) yield corr = null, not NaN.
    *
    * Output: (col_x, col_y, n_pairs, corr) for each x < y pair, ordered.
    */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two numeric columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j), s"p${i}_$j")
    // Pre-project the guarded pair columns once (a narrow codegen'd map)
    // so each of the 6·pairs aggregate buffers reads a plain attribute
    // instead of re-evaluating the finite/both-present guard chain.
    // widen: the decimal-exact sums are the CPU of this operator and the
    // single-row-group scan otherwise serializes them on one core.
    val guarded = graft.Par.widen(df).select(pairs.flatMap { case (x, y, al) =>
      val dx0 = col(x).cast("double"); val dy0 = col(y).cast("double")
      val fx = when(!isnan(dx0) && abs(dx0) =!= lit(Double.PositiveInfinity), dx0)
      val fy = when(!isnan(dy0) && abs(dy0) =!= lit(Double.PositiveInfinity), dy0)
      val both = fx.isNotNull && fy.isNotNull
      Seq(when(both, fx).as(s"${al}_gx"), when(both, fy).as(s"${al}_gy"))
    }: _*)
    val aggs = pairs.flatMap { case (_, _, al) =>
      val gx = col(s"${al}_gx"); val gy = col(s"${al}_gy")
      Seq(
        count(gx).as(s"${al}_n"),
        sum(gx.cast("decimal(28,6)")).as(s"${al}_sx"),
        sum(gy.cast("decimal(28,6)")).as(s"${al}_sy"),
        sum((gx * gy).cast("decimal(38,10)")).as(s"${al}_sxy"),
        sum((gx * gx).cast("decimal(38,10)")).as(s"${al}_sxx"),
        sum((gy * gy).cast("decimal(38,10)")).as(s"${al}_syy"))
    }
    val rows = pairs.map { case (x, y, al) =>
      val n = col(s"${al}_n").cast("double")
      val sx = col(s"${al}_sx").cast("double")
      val sy = col(s"${al}_sy").cast("double")
      val sxy = col(s"${al}_sxy").cast("double")
      val sxx = col(s"${al}_sxx").cast("double")
      val syy = col(s"${al}_syy").cast("double")
      val num = n * sxy - sx * sy
      val den = sqrt(greatest(n * sxx - sx * sx, lit(0.0)) *
        greatest(n * syy - sy * sy, lit(0.0)))
      struct(
        lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"${al}_n").as("n_pairs"),
        when(col(s"${al}_n") >= 2 && den > lit(0.0), round(num / den, 6))
          .as("corr"))
    }
    guarded.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("col_x", "col_y")
  }

  /** DuckDB twin of [[correlations]] — same pair list, same decimal
    * counters, same finalize formula and association order. */
  def duckCorrelationsSql(table: String, cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j), s"p${i}_$j")
    val aggs = pairs.flatMap { case (x, y, al) =>
      val gx = s"(CASE WHEN isfinite(CAST($x AS DOUBLE)) AND isfinite(CAST($y AS DOUBLE)) THEN CAST($x AS DOUBLE) END)"
      val gy = s"(CASE WHEN isfinite(CAST($x AS DOUBLE)) AND isfinite(CAST($y AS DOUBLE)) THEN CAST($y AS DOUBLE) END)"
      Seq(
        s"count($gx) AS ${al}_n",
        s"sum(CAST($gx AS DECIMAL(28,6))) AS ${al}_sx",
        s"sum(CAST($gy AS DECIMAL(28,6))) AS ${al}_sy",
        s"sum(CAST($gx * $gy AS DECIMAL(38,10))) AS ${al}_sxy",
        s"sum(CAST($gx * $gx AS DECIMAL(38,10))) AS ${al}_sxx",
        s"sum(CAST($gy * $gy AS DECIMAL(38,10))) AS ${al}_syy")
    }
    val arms = pairs.map { case (x, y, al) =>
      val n = s"CAST(${al}_n AS DOUBLE)"
      val sx = s"CAST(${al}_sx AS DOUBLE)"
      val sy = s"CAST(${al}_sy AS DOUBLE)"
      val sxy = s"CAST(${al}_sxy AS DOUBLE)"
      val sxx = s"CAST(${al}_sxx AS DOUBLE)"
      val syy = s"CAST(${al}_syy AS DOUBLE)"
      val num = s"($n * $sxy - $sx * $sy)"
      val den = s"sqrt(greatest($n * $sxx - $sx * $sx, 0.0) * greatest($n * $syy - $sy * $sy, 0.0))"
      s"""SELECT '$x' AS col_x, '$y' AS col_y, ${al}_n AS n_pairs,
         CASE WHEN ${al}_n >= 2 AND $den > 0.0
              THEN round($num / $den, 6) END AS corr
         FROM c"""
    }
    s"""WITH c AS (SELECT ${aggs.mkString(",\n      ")} FROM $table)
       ${arms.mkString("\n  UNION ALL\n  ")}
       ORDER BY col_x, col_y"""
  }

  /** Spearman rank correlation matrix — [[correlations]]' robust
    * sibling: Pearson over AVERAGE ranks (the standard tie treatment),
    * so monotone-nonlinear association reads as ±1 and a single
    * 10^9 leverage point moves the coefficient by ~1/n instead of
    * dragging it to 1 (the same breakdown argument as the median/MAD
    * outlier rule vs mean/σ). Rows are LISTWISE-complete (all listed
    * columns non-null and finite) so each column is ranked once, not
    * once per pair.
    *
    * Scale shape: ranking needs one global sort window per column — the
    * declared fenced cost of the EXACT rung (same contract as
    * `q_v_ks_exact`); at 10^12 rows the production path replaces ranks
    * with the t-digest CDF transform (mergeable, one pass), and this
    * operator is its oracle. The aggregation itself rides the
    * decimal-exact [[correlations]] path — average ranks are halves,
    * exact in decimal(28,6). */
  def spearman(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two numeric columns")
    import org.apache.spark.sql.expressions.Window
    val finite = cols.map { c =>
      val d = col(c).cast("double")
      d.isNotNull && !isnan(d) && abs(d) =!= lit(Double.PositiveInfinity)
    }.reduce(_ && _)
    val complete = df.filter(finite)
    // Both per-column windows share ONE sort: average rank
    // (2·rank + ties − 1)/2 equals (rank + cntLe)/2 where cntLe is the
    // running row count over a RANGE frame on the same ordering, so the
    // tie count no longer needs its own value-hash exchange per column —
    // the previous shape paid an extra Exchange hashpartitioning(value)
    // per column on top of the rank sort (integer identity:
    // rank = cntLt+1, ties = cntLe − cntLt ⇒ 2·rank+ties−1 = rank+cntLe).
    // The chained windows leave the frame in one partition; correlations'
    // own widen() re-spreads it before the decimal-exact sums.
    val ranked = complete.select(cols.map { c =>
      val d = col(c).cast("double")
      val w1 = Window.orderBy(d)
      val w2 = Window.orderBy(d)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      ((rank().over(w1) + count(lit(1L)).over(w2)).cast("double") /
        lit(2.0)).as(c)
    }: _*)
    correlations(ranked, cols)
  }

  /** DuckDB twin of [[spearman]] — the rank subquery feeds the
    * generated [[duckCorrelationsSql]] verbatim. */
  def duckSpearmanSql(table: String, cols: Seq[String]): String = {
    val finite = cols
      .map(c => s"$c IS NOT NULL AND isfinite(CAST($c AS DOUBLE))")
      .mkString(" AND ")
    val ranks = cols.map { c =>
      s"""CAST(2 * rank() OVER (ORDER BY CAST($c AS DOUBLE)) +
          count(*) OVER (PARTITION BY CAST($c AS DOUBLE)) - 1 AS DOUBLE) / 2.0 AS $c"""
    }.mkString(",\n         ")
    duckCorrelationsSql(
      s"""(SELECT
         $ranks
       FROM $table WHERE $finite)""", cols)
  }
}
