package graft.dev

import graft.images.{ImageCodec, ImageGen, Phash}

/** One-off calibration harness for the mirror-dup rung's thresholds:
  * prints the hamming distributions the q_dedup_phash_mirror cuts were
  * pinned from (variant-probe vs plain, same-dims and planted
  * cross-resolution). Not a spec — run with Test/runMain when
  * re-calibrating after a kernel change. */
object MirrorCalib {
  def mirrorX(px: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    def hist(xs: Seq[Int], label: String): Unit = {
      val g = xs.groupBy(x => math.min(x / 4 * 4, 24)).view.mapValues(_.size).toSeq.sortBy(_._1)
      println(s"$label n=${xs.size} max=${xs.max} " + g.map { case (b, c) => s"[$b-${b + 3}]:$c" }.mkString(" "))
    }
    // 1. same-dims pixel mirror: flip-x probe (variant 1) vs plain hash
    val samedims = for (i <- 0L until 200L; (w, h) <- Seq((45, 37), (40, 30), (64, 48))) yield {
      val px = ImageCodec.synthPixels(i, w, h)
      Phash.hamming(Phash.dihedralPhashes(px, w, h)(1), Phash.dihedralPhashes(mirrorX(px, w, h), w, h)(0))
    }
    hist(samedims, "same-dims probe-vs-plain")

    // 2. planted pair, cross-resolution: min over the mirror row's 8
    //    variant probes vs the anchor's plain hash (what the query bands)
    val planted = (0L until 5000L).filter(ImageGen.isMirrorDup).map { i =>
      val a = ImageGen.mirrorAnchor(i)
      def dims(j: Long): (Int, Int) = {
        val m = ImageCodec.mix64(j * 31 + 7)
        (24 + ((m >>> 3) & 31).toInt, 24 + ((m >>> 9) & 31).toInt)
      }
      val (wi, hi) = dims(i); val (wa, ha) = dims(a)
      val mpx = ImageGen.truthPixels(i, wi, hi)
      val apx = ImageGen.truthPixels(a, wa, ha)
      val aPlain = Phash.dihedralPhashes(apx, wa, ha)(0)
      val probes = Phash.dihedralPhashes(mpx, wi, hi)
      val dih = probes.map(p => Phash.hamming(p, aPlain)).min
      val full = Phash.hamming(Phash.phash64(mpx, wi, hi), aPlain)
      (dih, full)
    }
    hist(planted.map(_._1), "planted min-probe")
    hist(planted.map(_._2), "planted full")
    println(s"planted n=${planted.size} dih<=6: ${planted.count(_._1 <= 6)}" +
      s" full>=12: ${planted.count(_._2 >= 12)}")
  }
}
