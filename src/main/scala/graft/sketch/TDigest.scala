package graft.sketch

import scala.collection.mutable.ArrayBuffer

/** Minimal merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", arXiv:1902.04023 — see PAPERS.md): mergeable
  * quantile sketch for the drift checks. The reference never needs sketches
  * (single node, SURVEY.md §2.4 note); at 10^12 rows drift quantiles must
  * merge across partitions and resumed runs, hence a mergeable buffer that
  * serializes to bytes and persists in the baseline-snapshot table.
  *
  * Scale-aware: k1 scale function (quantile-weighted centroid caps), sorted
  * merge-compress, O(δ) memory per partition.
  */
class TDigest(val compression: Double = 100.0) extends Serializable {
  // unmerged points + merged centroids, each (mean, weight)
  private var means = new ArrayBuffer[Double]()
  private var weights = new ArrayBuffer[Double]()
  private var unmerged = 0
  var count: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def add(x: Double, w: Double = 1.0): Unit = {
    means += x; weights += w; unmerged += 1
    count += w
    if (x < min) min = x
    if (x > max) max = x
    if (unmerged > 4 * compression.toInt) compress()
  }

  def merge(other: TDigest): TDigest = {
    var i = 0
    while (i < other.means.length) { means += other.means(i); weights += other.weights(i); i += 1 }
    count += other.count
    min = math.min(min, other.min)
    max = math.max(max, other.max)
    unmerged += other.means.length
    compress()
    this
  }

  private def kScale(q: Double): Double =
    compression * (math.asin(2 * q - 1) / math.Pi + 0.5)

  def compress(): Unit = {
    if (means.isEmpty) { unmerged = 0; return }
    val idx = means.indices.sortBy(means(_))
    val nm = new ArrayBuffer[Double](); val nw = new ArrayBuffer[Double]()
    var cm = means(idx.head); var cw = weights(idx.head)
    var soFar = 0.0
    var i = 1
    while (i < idx.length) {
      val m = means(idx(i)); val w = weights(idx(i))
      val q0 = soFar / count
      val q1 = (soFar + cw + w) / count
      if (kScale(q1) - kScale(q0) <= 1.0) {
        // merge into current centroid (weighted mean)
        cm = (cm * cw + m * w) / (cw + w)
        cw += w
      } else {
        nm += cm; nw += cw; soFar += cw
        cm = m; cw = w
      }
      i += 1
    }
    nm += cm; nw += cw
    means = nm; weights = nw
    unmerged = 0
  }

  /** Interpolated quantile estimate, q ∈ [0,1]. */
  def quantile(q: Double): Double = {
    compress()
    if (count == 0) return Double.NaN
    if (means.length == 1) return means.head
    val target = q * count
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val half = weights(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return math.max(min, means.head)
        val prevHalf = weights(i - 1) / 2.0
        val lo = cum - prevHalf
        val frac = (target - lo) / (half + prevHalf)
        return means(i - 1) + (means(i) - means(i - 1)) * math.max(0.0, math.min(1.0, frac))
      }
      cum += weights(i)
      i += 1
    }
    math.min(max, means.last)
  }

  /** CDF estimate at x (for KS between two digests). */
  def cdf(x: Double): Double = {
    compress()
    if (count == 0) return Double.NaN
    if (x < min) return 0.0
    if (x >= max) return 1.0
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      if (means(i) >= x) {
        if (i == 0) return (weights(0) / 2.0) / count * ((x - min) / math.max(1e-12, means(0) - min))
        val m0 = means(i - 1); val m1 = means(i)
        val frac = (x - m0) / math.max(1e-12, m1 - m0)
        return (cum - weights(i - 1) / 2.0 + (weights(i - 1) + weights(i)) / 2.0 * frac) / count
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  def toBytes: Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 * (3 + 2 * means.length) + 4)
    bb.putDouble(compression); bb.putDouble(min); bb.putDouble(max)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def fromBytes(b: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val td = new TDigest(bb.getDouble)
    val mn = bb.getDouble; val mx = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val m = bb.getDouble; val w = bb.getDouble
      td.add(m, w)
      i += 1
    }
    td.min = mn; td.max = mx
    td
  }

  /** Two-sample KS statistic over a merged evaluation grid. */
  def ks(a: TDigest, b: TDigest, gridPoints: Int = 200): Double = {
    val lo = math.min(a.min, b.min); val hi = math.max(a.max, b.max)
    if (!(hi > lo)) return 0.0
    var maxDiff = 0.0
    var i = 0
    while (i <= gridPoints) {
      val x = lo + (hi - lo) * i / gridPoints
      val d = math.abs(a.cdf(x) - b.cdf(x))
      if (d > maxDiff) maxDiff = d
      i += 1
    }
    maxDiff
  }
}
