package graft.images

import graft.SparkTestBase

/** The lumaQuality kernel must behave analytically on constructed
  * images: zero Laplacian variance on flat and linear-gradient fields,
  * high variance on a checkerboard, exact clip fractions, exact
  * brightness/contrast moments. */
class LumaQualitySpec extends SparkTestBase {

  private def gray(y: Int): Int = 0xff000000 | (y << 16) | (y << 8) | y

  test("flat field: zero sharpness, zero contrast, exact brightness") {
    val (s, b, c, lo, hi) = ImageCodec.lumaQuality(
      Array.fill(64)(gray(128)), 8, 8)
    assert(s == 0.0 && c == 0.0 && b == 128.0 && lo == 0.0 && hi == 0.0)
  }

  test("linear gradient: second derivative is zero — NOT flagged blurry") {
    // luma rises by 8 per column: first derivative constant, Laplacian 0
    val px = Array.tabulate(64)(i => gray(8 * (i % 8) + 60))
    val (s, _, c, _, _) = ImageCodec.lumaQuality(px, 8, 8)
    assert(s == 0.0, s"gradient must have zero Laplacian variance, got $s")
    assert(c > 0.0)
  }

  test("checkerboard: maximal Laplacian variance") {
    val px = Array.tabulate(64)(i =>
      gray(if ((i % 8 + i / 8) % 2 == 0) 0 else 255))
    val (s, b, _, lo, hi) = ImageCodec.lumaQuality(px, 8, 8)
    // interior Laplacian alternates ±(4*255 - 0) etc.: variance is large
    assert(s > 100000.0, s"checkerboard sharpness $s")
    assert(lo == 0.5 && hi == 0.5) // half the pixels at each rail
    assert(b == 127.5)
  }

  test("clip fractions are exact pixel ratios") {
    val px = Array.fill(48)(gray(128)) ++ Array.fill(8)(gray(0)) ++
      Array.fill(8)(gray(255))
    val (_, _, _, lo, hi) = ImageCodec.lumaQuality(px, 8, 8)
    assert(lo == 8.0 / 64 && hi == 8.0 / 64)
  }

  test("planted degraded parts separate from clean parts by blur rate") {
    val f = graft.validation.ImageSuiteQueries.queries("q_i_quality_gates")(
      spark, "/root/testdata/sf0.001")
    val rates = f.select("part", "blur_rate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (hi2, lo2) = rates.values.toSeq.sorted.reverse.splitAt(2)
    assert(hi2.min > 0.5 && lo2.max < 0.3,
      s"blur gate does not separate planted parts: $rates")
  }
}
