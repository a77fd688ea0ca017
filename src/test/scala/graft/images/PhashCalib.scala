package graft.images

/** One-off calibration: hamming(stored, recomputed-from-decode) stats over
  * clean rows at generated dims. Run: sbt "Test/runMain graft.images.PhashCalib"
  */
object PhashCalib {
  def main(args: Array[String]): Unit = {
    val np = 8
    val ds = (0L until 2000L).flatMap { i =>
      if (ImageGen.defectOf(i) != "clean") None
      else {
        val r = ImageGen.genRow(i, np)
        ImageCodec.decode(r.bytes).map { case (px, w, h) =>
          val d = Phash.hamming(Phash.phash64(px, w, h), r.phash)
          (i, r.fmt, w, h, d)
        }
      }
    }
    val byFmt = ds.groupBy(_._2)
    byFmt.foreach { case (fmt, xs) =>
      val dist = xs.map(_._5).sorted
      println(s"$fmt n=${dist.size} max=${dist.last} p99=${dist((dist.size * 99) / 100)} " +
        s"p90=${dist((dist.size * 9) / 10)} mean=${dist.sum.toDouble / dist.size}")
      println("  worst: " + xs.sortBy(-_._5).take(8).map(x => s"id=${x._1} ${x._3}x${x._4} d=${x._5}").mkString(", "))
    }
  }
}
