package graft.operators

import graft.{CurationQueries, SparkTestBase}

/** Independent plain-Scala recomputation of the curation operators
  * (per-source cap, stratified sampling, sequence packing) against the
  * sf0.001 documents table — the spec-level twin of the DuckDB oracles.
  */
class CurationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private case class Doc(id: Long, text: String, lang: String,
                         source: String, nChars: Long)

  private lazy val docs: Seq[Doc] =
    graft.Tables(spark, dir, "documents")
      .collect()
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars")))
      .toSeq

  private def md5FirstByte(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    d(0) & 0xFF
  }

  private def tokCount(text: String): Long =
    graft.TextQueries.TokenPattern.r.findAllIn(text).size.toLong

  test("q_curate_source_cap keeps the top-N per source by (n_chars desc, id)") {
    val expected = docs.groupBy(_.source).flatMap { case (src, ds) =>
      ds.sortBy(d => (-d.nChars, d.id)).take(CurationQueries.SourceCap)
        .zipWithIndex.map { case (d, i) => (d.id, src, d.nChars, i + 1) }
    }.toSet
    val got = CurationQueries.queries("q_curate_source_cap")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Int]("rk")))
      .toSet
    assert(got == expected)
  }

  test("q_curate_stratified keeps exactly the md5-prefix survivors per lang") {
    val rates = CurationQueries.StratRates256.toMap
    val expected = docs
      .filter(d => md5FirstByte(d.id) < rates.getOrElse(d.lang, 0))
      .map(d => (d.id, d.lang, d.source)).toSet
    val got = CurationQueries.queries("q_curate_stratified")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source")))
      .toSet
    assert(got == expected)
    // the rebalance must bite: en is downsampled hard, zh kept whole
    val keptEn = expected.count(_._2 == "en").toDouble
    val totalEn = docs.count(_.lang == "en").toDouble
    assert(keptEn / totalEn < 0.25, s"en keep-rate ${keptEn / totalEn}")
    assert(expected.count(_._2 == "zh") == docs.count(_.lang == "zh"))
  }

  test("q_pack_sequences bins match a sequential concat-and-chunk per shard") {
    val expected = docs.filter(_.text != null)
      .map(d => (d.id, d.id % CurationQueries.PackShards, tokCount(d.text)))
      .groupBy(_._2).flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, _, tok) =>
          val binStart = cum // the doc's first token offset
          cum += tok
          (id, shard, tok,
            math.floor(binStart.toDouble / CurationQueries.PackBudget).toLong)
        }
      }.toSet
    val got = CurationQueries.queries("q_pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("tok"), r.getAs[Long]("bin")))
      .toSet
    assert(got == expected)
    // overflow bound: every bin except a shard's last holds >= budget
    // tokens only via its LAST doc's spill — fill below 1.0 can only be
    // the final (partial) bin of a shard
    val byBin = expected.groupBy(e => (e._2, e._4))
    val lastBin = byBin.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    byBin.foreach { case ((shard, bin), es) =>
      val fill = es.map(_._3).sum
      if (bin != lastBin(shard))
        assert(fill >= CurationQueries.PackBudget,
          s"non-final bin ($shard,$bin) underfilled: $fill")
    }
  }

  test("q_pack_stats aggregates the same assignment") {
    val got = CurationQueries.queries("q_pack_stats")(spark, dir)
      .collect()
      .map(r => ((r.getAs[Long]("shard"), r.getAs[Long]("bin")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))))
      .toMap
    // NB: flatMap over the groupBy Map must land in a Seq — a Map result
    // would collapse duplicate (shard, bin) keys and lose docs
    val perDoc: Seq[((Long, Long), Long)] = docs.filter(_.text != null)
      .map(d => (d.id % CurationQueries.PackShards, tokCount(d.text), d.id))
      .groupBy(_._1).toSeq.flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._3).map { case (_, tok, _) =>
          val b = math.floor(cum.toDouble / CurationQueries.PackBudget).toLong
          cum += tok
          ((shard, b), tok)
        }
      }
    val expected = perDoc.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }
    assert(got == expected)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala replay of the token-budget selection: per source, walk
    * docs in (md5(id), id) order, keep every doc that starts below budget. */
  private def expectBudgetSel: Map[Long, (Long, Long)] =
    docs.filter(_.text != null).groupBy(_.source).flatMap { case (src, ds) =>
      val budget =
        if (src.drop(3).toInt % 2 == 0) CurationQueries.BudgetEven
        else CurationQueries.BudgetOdd
      var cum = 0L
      ds.sortBy(d => (md5hex(d.id.toString), d.id)).flatMap { d =>
        val tok = tokCount(d.text)
        val start = cum
        cum += tok
        if (start < budget) Some(d.id -> (tok, cum)) else None
      }
    }

  test("q_curate_token_budget matches the plain-Scala prefix walk") {
    val got = CurationQueries.queries("q_curate_token_budget")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tok"), r.getAs[Long]("cum")))
      .toMap
    assert(got == expectBudgetSel)
    assert(got.nonEmpty)
  }

  test("token budget: every source overflows its budget by at most one doc") {
    val rows = CurationQueries.queries("q_curate_token_budget")(spark, dir)
      .collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val budget = rs.head.getAs[Long]("budget")
      // kept iff the doc STARTS below budget — so cumulative tokens can
      // exceed the budget on at most the one straddling doc
      assert(rs.count(_.getAs[Long]("cum") > budget) <= 1,
        s"$src overflows by more than one doc")
      rs.foreach(r =>
        assert(r.getAs[Long]("cum") - r.getAs[Long]("tok") < budget,
          s"$src kept a doc that starts past the budget"))
    }
  }
}
