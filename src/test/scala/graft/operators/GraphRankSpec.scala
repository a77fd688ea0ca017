package graft

/** PageRank must equal a plain-Scala power iteration over the same
  * derived multigraph (same decimal-sum discipline), conserve total
  * mass, and respect in-degree ordering on average. */
class GraphRankSpec extends SparkTestBase {

  test("ranks equal plain-Scala power iteration; mass conserved") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val got = GraphRank.pagerank(orders, customer)
      .as[(Long, Double, Long, Long)].collect().toSeq

    // plain-Scala twin
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val custkeys = customer.select("c_custkey").as[Long].collect().sorted
    val mk = custkeys.max + 1
    val n = custkeys.length
    val eraw = orders.select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect()
      .map { case (c, o) =>
        (c, java.lang.Long.parseLong(md5hex(o.toString).take(6), 16) % mk)
      }
    val outDeg = eraw.groupBy(_._1).map { case (s, es) => s -> es.length }
    val w = eraw.groupBy(identity).map { case ((s, d), es) =>
      (s, d, es.length.toDouble / outDeg(s).toDouble) }.toSeq
    def dsum(xs: Iterable[Double]): Double =
      xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val base = (1.0 - GraphRank.Damping) / n.toDouble
    var rank = custkeys.map(_ -> 1.0 / n.toDouble).toMap
    for (_ <- 1 to GraphRank.Rounds) {
      val dm = dsum(custkeys.filterNot(outDeg.contains).map(rank))
      val in = w.groupBy(_._2).map { case (d, es) =>
        d -> dsum(es.map { case (s, _, wt) => rank(s) * wt }) }
      rank = custkeys.map(id => id -> (base + GraphRank.Damping *
        (in.getOrElse(id, 0.0) + dm / n.toDouble))).toMap
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val inDeg = eraw.groupBy(_._2).map { case (d, es) => d -> es.length }
    val want = custkeys.map(id => (id, r6(rank(id)),
      outDeg.getOrElse(id, 0).toLong, inDeg.getOrElse(id, 0).toLong)).toSeq
    assert(got == want, s"pagerank diverged (first 3): " +
      s"${got.take(3)} vs ${want.take(3)}")

    // mass conservation: Σ rank = 1 up to rounding and dangling leak
    val mass = got.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-2, s"mass=$mass")
    // authority follows citations: mean rank of the top-in-degree decile
    // exceeds the bottom-in-degree decile's
    val byIn = got.sortBy(-_._4)
    val hi = byIn.take(n / 10).map(_._2)
    val lo = byIn.takeRight(n / 10).map(_._2)
    assert(hi.sum / hi.size > lo.sum / lo.size,
      s"hi=${hi.sum / hi.size} lo=${lo.sum / lo.size}")
  }
}
