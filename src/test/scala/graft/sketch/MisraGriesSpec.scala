package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Misra–Gries guarantees, independently checked against exact counts:
  * one-sided error bound, mergeable combine (Agarwal et al. PODS 2012),
  * no-false-negative candidate nomination, serialization round-trip.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  // skewed synthetic stream: few heavy words, long noise tail
  private def stream(seed: Int, n: Int): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.10) "alpha"
      else if (r < 0.17) "beta"
      else if (r < 0.22) "gamma"
      else s"noise${rnd.nextInt(5000)}"
    }
  }

  test("exact when distinct items fit the capacity") {
    val s = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val mg = new MisraGries(8)
    Random.shuffle(s).foreach(mg.add(_))
    assert(mg.counters.toMap == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
    assert(mg.n == 100)
  }

  test("single-sketch error bound: true - n/(k+1) <= est <= true") {
    val s = stream(1, 20000)
    val truth = exact(s)
    val k = 64
    val mg = new MisraGries(k)
    s.foreach(mg.add(_))
    assert(mg.n == s.size)
    mg.counters.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(est >= t - mg.n / (k + 1), s"$item underestimated beyond bound")
    }
  }

  test("merged sketches keep the bound over the combined stream") {
    val parts = (0 until 7).map(i => stream(100 + i, 3000 + 500 * i))
    val all = parts.flatten
    val truth = exact(all)
    val k = 64
    val merged = parts.map { p =>
      val mg = new MisraGries(k); p.foreach(mg.add(_)); mg
    }.reduce(_.merge(_))
    assert(merged.n == all.size)
    merged.counters.foreach { case (item, est) =>
      assert(est <= truth(item))
      assert(est >= truth(item) - merged.n / (k + 1))
    }
  }

  test("candidates(phi) never misses a true phi-heavy item, any merge order") {
    val parts = (0 until 8).map(i => stream(200 + i, 4000))
    val all = parts.flatten
    val truth = exact(all)
    val phi = 0.02
    val k = 64 // k >= 1/phi = 50
    val heavy = truth.collect { case (w, c) if c > phi * all.size => w }.toSet
    assert(heavy.nonEmpty, "fixture must contain heavy hitters")
    (0 until 5).foreach { ord =>
      val sketches = new Random(ord).shuffle(parts.toList).map { p =>
        val mg = new MisraGries(k); p.foreach(mg.add(_)); mg
      }
      val merged = sketches.reduce(_.merge(_))
      val cand = merged.candidates(phi).toSet
      assert(heavy.subsetOf(cand),
        s"order $ord dropped ${heavy -- cand} from the candidate set")
      assert(cand.size <= k)
    }
  }

  test("weighted add matches unit-step semantics") {
    val unit = new MisraGries(3)
    val batch = new MisraGries(3)
    val items = Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 4L), ("a", 2L), ("e", 1L))
    items.foreach { case (it, w) =>
      (0L until w).foreach(_ => unit.add(it))
      batch.add(it, w)
    }
    assert(unit.counters.toMap == batch.counters.toMap)
    assert(unit.n == batch.n)
  }

  test("bytes round-trip preserves the summary") {
    val mg = new MisraGries(16)
    stream(9, 5000).foreach(mg.add(_))
    val back = MisraGries.fromBytes(mg.toBytes)
    assert(back.k == mg.k && back.n == mg.n)
    assert(back.counters.toMap == mg.counters.toMap)
  }
}
