package graft.operators

import graft.{LayoutQueries, SparkTestBase}

/** Independent plain-Scala recomputation of the layout/planner-stats
  * operators (zone-map pruning, z-order clustering, join-cardinality
  * sketch) against sf0.001 — the spec-level twin of the DuckDB oracles,
  * plus assertions that the layout comparisons actually demonstrate the
  * effect they exist to demonstrate.
  */
class LayoutSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private case class Li(orderkey: Long, partkey: Long, suppkey: Long,
                        shipdateMs: Long)

  private lazy val lineitem: Seq[Li] =
    graft.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate")
      .collect()
      .map(r => Li(r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"),
        r.getAs[Long]("l_suppkey"),
        r.getAs[java.time.LocalDateTime]("l_shipdate")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .toSeq

  private val fmt = {
    val f = new java.text.SimpleDateFormat("yyyy-MM-dd")
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f
  }
  private val predLo = fmt.parse(LayoutQueries.PredLo).getTime
  private val predHi = fmt.parse(LayoutQueries.PredHi).getTime

  test("q_layout_zonemap: estimate matches recomputation; clustered prunes, ingest cannot") {
    val rows = LayoutQueries.queries("q_layout_zonemap")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("zones_total"), r.getAs[Long]("zones_scanned"),
          r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matching")))
      .toMap

    val matching = lineitem.count(l => l.shipdateMs >= predLo && l.shipdateMs < predHi)

    def recompute(zoneOf: Li => String): (Long, Long, Long) = {
      val zones = lineitem.groupBy(zoneOf).values.toSeq
      val scanned = zones.filter(z =>
        z.map(_.shipdateMs).max >= predLo && z.map(_.shipdateMs).min < predHi)
      (zones.size.toLong, scanned.size.toLong, scanned.map(_.size.toLong).sum)
    }

    val monthFmt = {
      val f = new java.text.SimpleDateFormat("yyyy-MM")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f
    }
    val (iz, is, ir) = recompute(l => (l.orderkey / LayoutQueries.IngestZoneOrders).toString)
    val (cz, cs, cr) = recompute(l => monthFmt.format(new java.util.Date(l.shipdateMs)))

    assert(rows("ingest") == ((iz, is, ir, matching.toLong)))
    assert(rows("clustered") == ((cz, cs, cr, matching.toLong)))
    // the demonstrated effect: ingest scans everything, clustered prunes
    assert(rows("ingest")._2 == rows("ingest")._1, "uncorrelated layout must prune nothing")
    assert(rows("clustered")._3 < rows("ingest")._3 / 4,
      "clustered layout must scan far fewer rows")
    assert(rows("clustered")._3 >= matching, "scan set must cover all matching rows")
  }

  test("q_layout_zorder: morton recomputation matches; z-order confines the box") {
    def morton(qx: Long, qy: Long): Long =
      (0 until 8).map(i => (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1))).sum

    val rows = LayoutQueries.queries("q_layout_zorder")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("zones_total"), r.getAs[Long]("zones_touched"),
          r.getAs[Long]("rows_matching")))
      .toMap

    val maxPk = lineitem.map(_.partkey).max
    val maxSk = lineitem.map(_.suppkey).max
    def qx(l: Li): Long = math.floor(l.partkey * 256.0 / (maxPk + 1)).toLong
    def qy(l: Li): Long = math.floor(l.suppkey * 256.0 / (maxSk + 1)).toLong
    def hit(l: Li): Boolean =
      qx(l) >= LayoutQueries.QxLo && qx(l) <= LayoutQueries.QxHi &&
        qy(l) >= LayoutQueries.QyLo && qy(l) <= LayoutQueries.QyHi

    def touched(zoneOf: Li => Long): (Long, Long) = {
      val zones = lineitem.groupBy(zoneOf)
      (zones.size.toLong, zones.values.count(_.exists(hit)).toLong)
    }
    val matching = lineitem.count(hit).toLong
    val (lz, lt) = touched(_.orderkey / LayoutQueries.IngestZoneOrders)
    val (zz, zt) = touched(l => morton(qx(l), qy(l)) >> 6)

    assert(rows("linear") == ((lz, lt, matching)))
    assert(rows("zorder") == ((zz, zt, matching)))
    // the win: z-order touches a small fraction; linear touches everything
    assert(zt.toDouble / zz < 0.25, s"z-order should confine the box ($zt/$zz zones)")
    assert(lt == lz, "a 2% box on uncorrelated linear zones touches every zone")
  }

  test("q_layout_bloom: index is sound (no false negatives) and actually prunes") {
    val totalBits = LayoutQueries.BloomWords * LayoutQueries.BloomBits
    def positions(k: Long): Seq[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      Seq(Integer.parseInt(hex.substring(0, 3), 16) % totalBits,
        Integer.parseInt(hex.substring(3, 6), 16) % totalBits)
    }
    val zones = lineitem.groupBy(_.orderkey / LayoutQueries.BloomZoneOrders)
    val blooms = zones.view.mapValues { ls =>
      val bits = scala.collection.mutable.Set.empty[Int]
      ls.foreach(l => bits ++= positions(l.partkey))
      bits.toSet
    }.toMap
    val maxPk = lineitem.map(_.partkey).max

    val rows = LayoutQueries.queries("q_layout_bloom")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("probe_key") ->
        (r.getAs[Long]("zones_total"), r.getAs[Long]("zones_maybe"),
          r.getAs[Long]("zones_actual")))
      .toMap

    assert(rows.keySet == LayoutQueries.ProbeTenths
      .map(t => math.floor(maxPk.toDouble * t / 10).toLong).toSet)
    rows.foreach { case (probe, (total, maybe, actual)) =>
      val expectMaybe = blooms.values.count(positions(probe).forall(_)).toLong
      val expectActual = zones.values.count(_.exists(_.partkey == probe)).toLong
      assert(total == zones.size.toLong)
      assert(maybe == expectMaybe, s"probe $probe maybe")
      assert(actual == expectActual, s"probe $probe actual")
      assert(maybe >= actual, "Bloom must never rule out a zone that holds the key")
      assert(maybe < total / 2, s"index must prune most zones ($maybe/$total)")
    }
  }

  test("q_layout_stats_merge: merged partials equal direct full-table stats") {
    val monthFmt = {
      val f = new java.text.SimpleDateFormat("yyyy-MM")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f
    }
    val fullFmt = {
      val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f
    }
    // the SPEC recomputes the DIRECT path; the query computes base/batch
    // partials and merges — equality is the mergeability proof
    val direct = lineitem.groupBy(l => monthFmt.format(new java.util.Date(l.shipdateMs)))
      .map { case (zone, ls) =>
        zone -> (fullFmt.format(new java.util.Date(ls.map(_.shipdateMs).min)),
          fullFmt.format(new java.util.Date(ls.map(_.shipdateMs).max)),
          ls.size.toLong, ls.map(_.partkey).sum)
      }
    val got = LayoutQueries.queries("q_layout_stats_merge")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("zone") ->
        (r.getAs[String]("z_min"), r.getAs[String]("z_max"),
          r.getAs[Long]("z_rows"), r.getAs[Long]("z_sum_pk")))
      .toMap
    assert(got == direct)
  }

  test("q_layout_advisor: diagonal prunes, uncorrelated off-diagonal cannot") {
    val rows = LayoutQueries.queries("q_layout_advisor")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("cluster_col"), r.getAs[String]("pred_col")) ->
        (r.getAs[Long]("zones_scanned"), r.getAs[Long]("zones_total"),
          r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matching"),
          r.getAs[Double]("scan_frac")))
      .toMap
    assert(rows.size == LayoutQueries.AdvisorCols.size * LayoutQueries.AdvisorCols.size)
    rows.foreach { case ((k, p), (zs, zt, rs, rm, frac)) =>
      // zones_total counts NON-EMPTY buckets — narrow integer domains
      // (sf0.001 suppkey: 10 values over 16 buckets) leave some empty
      assert(zt >= 8 && zt <= LayoutQueries.AdvisorBuckets.toLong, s"($k,$p) zones_total=$zt")
      assert(rs >= rm, s"($k,$p) scan set must cover all matching rows")
      if (k == p)
        assert(frac < 0.4, s"clustering by the predicate column must prune ($k: $frac)")
      else
        assert(frac > 0.9,
          s"uncorrelated pair must show (honestly) that nothing prunes ($k,$p: $frac)")
    }

    // pin one diagonal cell against a plain-Scala recomputation
    val pks = lineitem.map(_.partkey.toDouble)
    val (mn, mx) = (pks.min, pks.max)
    val (lo, hi) = (mn + 0.4 * (mx - mn), mn + 0.6 * (mx - mn))
    val zones = pks.groupBy(v => math.floor((v - mn) * 16 / (mx - mn + 1)).toLong)
    val scannedZones = zones.filter { case (_, vs) => vs.max >= lo && vs.min < hi }
    val expect = (scannedZones.size.toLong, zones.size.toLong,
      scannedZones.values.map(_.size.toLong).sum,
      pks.count(v => v >= lo && v < hi).toLong)
    val got = rows(("l_partkey", "l_partkey"))
    assert((got._1, got._2, got._3, got._4) ==
      ((expect._1, expect._2, expect._3, expect._4)))
  }

  test("q_layout_joincard: estimator is an upper bound and converges with buckets") {
    def md5Bucket(k: Long, hexDigits: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take((hexDigits + 1) / 2).map(b => f"$b%02x").mkString.take(hexDigits), 16)
    }
    val orderkeys = graft.Tables(spark, dir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val liKeys = lineitem.map(_.orderkey)
    val truth = {
      val oCount = orderkeys.groupBy(identity).view.mapValues(_.size)
      liKeys.map(k => oCount.getOrElse(k, 0).toLong).sum
    }
    def est(hexDigits: Int): Long = {
      val oB = orderkeys.groupBy(md5Bucket(_, hexDigits)).view.mapValues(_.size.toLong)
      val lB = liKeys.groupBy(md5Bucket(_, hexDigits)).view.mapValues(_.size.toLong)
      oB.map { case (b, n) => n * lB.getOrElse(b, 0L) }.sum
    }

    val rows = LayoutQueries.queries("q_layout_joincard")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("n_buckets") ->
        (r.getAs[Long]("est_rows"), r.getAs[Long]("true_rows")))
      .toMap

    assert(rows(256L) == ((est(2), truth)))
    assert(rows(65536L) == ((est(4), truth)))
    // estimator contract: upper bound, monotone convergence
    assert(rows(256L)._1 >= truth && rows(65536L)._1 >= truth)
    assert(rows(65536L)._1 <= rows(256L)._1)
    assert(rows(65536L)._1 - truth < truth,
      "at 65k buckets over ~1.5k keys the estimate should be within 2x of truth")
  }

  test("q_layout_skew_advisor matches the plain-Scala histogram math") {
    val flags = graft.Tables(spark, dir, "lineitem")
      .select("l_returnflag").collect().map(_.getString(0))
    val counts = flags.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val share = math.max(math.ceil(total.toDouble / LayoutQueries.SkewTasks).toLong, 1L)
    val rows = counts.toSeq.map { case (k, n) =>
      val hot = n > LayoutQueries.SkewHotFactor * share
      (if (hot) k else "OTHER", n,
        if (hot) math.ceil(n.toDouble / share).toLong else 1L)
    }
    assert(rows.exists(_._1 != "OTHER"), "demo table must have hot keys")
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.iterator.map(_._2).sum, vs.size.toLong, vs.iterator.map(_._3).max)
    }
    val got = LayoutQueries.queries("q_layout_skew_advisor")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("grp_key") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"), r.getAs[Long]("salt")))
      .toMap
    assert(got == expect)
    // the advisor's contract: salting a hot key at the recommended factor
    // restores <= hot-factor x fair share per subkey
    got.foreach { case (g, (n, keys, salt)) =>
      if (g != "OTHER")
        assert(math.ceil(n.toDouble / salt) <= LayoutQueries.SkewHotFactor * share,
          s"key $g salted at $salt still overflows")
    }
  }

  test("q_layout_compaction: groups cover every file once, never cross partitions, and respect first-fit") {
    // plain-Scala manifest: (month, batch) → bytes from the same integer term
    val liQ = graft.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .collect()
      .map { r =>
        val month = r.getAs[java.time.LocalDateTime]("l_shipdate")
          .toLocalDate.toString.substring(0, 7)
        val bytes = (r.getAs[Double]("l_quantity") * 17 +
          r.getAs[Int]("l_linenumber") * 5 + 83).toLong
        ((month, r.getAs[Long]("l_orderkey") % 8), bytes)
      }
    val manifest = liQ.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    // first-fit within each month by batch order
    val expected = manifest.keys.groupBy(_._1).flatMap { case (month, ks) =>
      var cum = 0L
      ks.toSeq.sortBy(_._2).map { k =>
        val grp = math.floor(cum.toDouble / LayoutQueries.CompactTarget).toLong
        cum += manifest(k)._2
        (k, grp)
      }
    }
    val expGroups = expected.groupBy { case ((month, _), grp) => (month, grp) }
      .map { case (mg, fs) =>
        // NB: fs.keys is a Set — map through an iterator so files with
        // EQUAL row counts don't collapse before the sum
        mg -> (fs.size.toLong,
          fs.keys.iterator.map(k => manifest(k)._1).sum,
          fs.keys.iterator.map(k => manifest(k)._2).sum)
      }
    val got = LayoutQueries.queries("q_layout_compaction")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("grp")) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("g_rows"), r.getAs[Long]("g_bytes")))
      .toMap
    assert(got == expGroups)
    // every file lands in exactly one group
    assert(got.values.map(_._1).sum == manifest.size.toLong)
    // a group never straddles months by construction of the key; and no
    // group except a month's last can START above target (first-fit)
    got.keys.groupBy(_._1).foreach { case (_, gs) =>
      val ids = gs.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.size).toSeq, "group ids are dense per month")
    }
  }
}
