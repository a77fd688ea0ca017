package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TDigestSpec extends AnyFunSuite {

  test("quantiles of uniform data accurate to ~1%") {
    val rnd = new Random(42)
    val td = new TDigest(100)
    val xs = Array.fill(50000)(rnd.nextDouble() * 100)
    xs.foreach(td.add(_))
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      assert(math.abs(td.quantile(q) - q * 100) < 2.0, s"q=$q got ${td.quantile(q)}")
    }
  }

  test("merge of shards ≈ single digest (mergeability)") {
    val rnd = new Random(7)
    val xs = Array.fill(40000)(rnd.nextGaussian() * 10 + 50)
    val whole = new TDigest(100); xs.foreach(whole.add(_))
    val shards = xs.grouped(5000).map { g =>
      val t = new TDigest(100); g.foreach(t.add(_)); t
    }
    val merged = shards.reduce(_ merge _)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) < 1.5,
        s"q=$q merged=${merged.quantile(q)} whole=${whole.quantile(q)}")
    }
    assert(merged.count == xs.length.toDouble)
  }

  test("serialization roundtrip preserves quantiles and count") {
    val td = new TDigest(100)
    (1 to 10000).foreach(i => td.add(i.toDouble))
    val rt = TDigest.fromBytes(td.toBytes)
    assert(rt.count == td.count)
    assert(math.abs(rt.quantile(0.5) - td.quantile(0.5)) < 1e-9)
    assert(rt.min == td.min && rt.max == td.max)
  }

  test("KS: same distribution ≈ 0, shifted distribution large") {
    val rnd = new Random(11)
    def dig(shift: Double) = {
      val t = new TDigest(100)
      (1 to 20000).foreach(_ => t.add(rnd.nextGaussian() * 5 + 50 + shift))
      t
    }
    assert(TDigest.ks(dig(0), dig(0)) < 0.05)
    assert(TDigest.ks(dig(0), dig(15)) > 0.5)
  }
}
