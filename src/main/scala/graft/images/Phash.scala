package graft.images

/** 64-bit DCT perceptual hash (classic pHash construction): grayscale →
  * resample to 32×32 → 2-D DCT-II → top-left 8×8 low-frequency block
  * (skipping DC) + one extra coefficient → sign-vs-median bits.
  *
  * The stored `phash` column is validated by recomputing this from decoded
  * bytes and bucketing the hamming distance — the graft twin of the
  * reference's elevation-difference buckets
  * (/root/reference/src/crawl_first/validation_agent.py:730-750).
  * Deterministic pure Scala; no native deps.
  */
object Phash {
  private val N = 32

  // Thread-local scratch for the three N×N double planes and the tile
  // sub-image: the hash kernels run once per image (5× with quadrant
  // tiles) on executor task threads, and per-call allocation of ~40 KB
  // of arrays dominated the decode stage's allocation rate (~120 KB per
  // image → GC pressure that measurably sagged per-core throughput at
  // local[4] in the spark-submit scaling twin). Every cell of every
  // plane is overwritten before it is read, so reuse cannot leak state
  // between calls; values are bit-identical to the allocating version.
  private val bufGray = ThreadLocal.withInitial[Array[Double]](() => new Array[Double](N * N))
  private val bufTmp = ThreadLocal.withInitial[Array[Double]](() => new Array[Double](N * N))
  private val bufOut = ThreadLocal.withInitial[Array[Double]](() => new Array[Double](N * N))
  private val bufSub = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](0)
  }
  private def subBuf(n: Int): Array[Int] = {
    var b = bufSub.get()
    if (b.length < n) { b = new Array[Int](n); bufSub.set(b) }
    b
  }

  /** Mean-pool (area-average) resample of packed-RGB to N×N grayscale. */
  private def toGray32(px: Array[Int], w: Int, h: Int): Array[Double] = {
    val g = bufGray.get()
    var gy = 0
    while (gy < N) {
      val y0 = gy * h / N; val y1 = math.max(y0 + 1, (gy + 1) * h / N)
      var gx = 0
      while (gx < N) {
        val x0 = gx * w / N; val x1 = math.max(x0 + 1, (gx + 1) * w / N)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        g(gy * N + gx) = sum / n
        gx += 1
      }
      gy += 1
    }
    g
  }

  private lazy val cosTable: Array[Double] = {
    val t = new Array[Double](N * N)
    var u = 0
    while (u < N) {
      var x = 0
      while (x < N) {
        t(u * N + x) = math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
        x += 1
      }
      u += 1
    }
    t
  }

  /** 2-D DCT-II of an N×N block (row-column decomposition, O(N^3)). */
  private def dct2d(g: Array[Double]): Array[Double] = {
    val tmp = bufTmp.get()
    var y = 0
    while (y < N) { // DCT along rows
      var u = 0
      while (u < N) {
        var s = 0.0; var x = 0
        while (x < N) { s += g(y * N + x) * cosTable(u * N + x); x += 1 }
        tmp(y * N + u) = s
        u += 1
      }
      y += 1
    }
    val out = bufOut.get()
    var u = 0
    while (u < N) { // DCT along columns
      var v = 0
      while (v < N) {
        var s = 0.0; var y2 = 0
        while (y2 < N) { s += tmp(y2 * N + u) * cosTable(v * N + y2); y2 += 1 }
        out(v * N + u) = s
        v += 1
      }
      u += 1
    }
    out
  }

  /** 64-bit pHash of packed-RGB pixels. */
  def phash64(px: Array[Int], w: Int, h: Int): Long = {
    val coef = dct2d(toGray32(px, w, h))
    // 64 low-frequency coefficients: the 8×8 block skipping (0,0) DC,
    // plus coefficient (8,0) to keep 64 bits.
    val vals = new Array[Double](64)
    var i = 0
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if (!(u == 0 && v == 0)) { vals(i) = coef(v * N + u); i += 1 }
        u += 1
      }
      v += 1
    }
    vals(63) = coef(8 * N)
    val sorted = vals.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (vals(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Per-quadrant 64-bit pHashes (TL, TR, BL, BR) — the tile signatures
    * behind partial-crop/region duplicate detection: a composite image
    * that lifted one region from another image shares that quadrant's
    * hash while the full-image hash diverges. Each quadrant is resampled
    * to the same 32×32 grid, so tiles of images at different resolutions
    * remain comparable (the pattern, not the pixel count, is hashed).
    * Quadrant split is ceil-floor: left/top halves get the extra pixel
    * on odd dims; any quadrant degenerating below 1×1 yields 0L.
    */
  def tilePhashes(px: Array[Int], w: Int, h: Int): Array[Long] = {
    val out = new Array[Long](4)
    if (w < 2 || h < 2 || px.length != w * h) return out
    val wl = (w + 1) / 2; val hl = (h + 1) / 2
    val qs = Array((0, 0, wl, hl), (wl, 0, w - wl, hl),
      (0, hl, wl, h - hl), (wl, hl, w - wl, h - hl))
    var q = 0
    while (q < 4) {
      val (x0, y0, qw, qh) = qs(q)
      if (qw >= 1 && qh >= 1) {
        val sub = subBuf(qw * qh)
        var y = 0
        while (y < qh) {
          System.arraycopy(px, (y0 + y) * w + x0, sub, y * qw, qw)
          y += 1
        }
        out(q) = phash64(sub, qw, qh)
      }
      q += 1
    }
    out
  }
}
