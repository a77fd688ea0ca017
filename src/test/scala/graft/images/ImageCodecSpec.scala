package graft.images

import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {

  test("png/bmp roundtrip is lossless (PSNR = ∞)") {
    for (fmt <- Seq("png", "bmp")) {
      val px = ImageCodec.synthPixels(7L, 40, 32)
      val bytes = ImageCodec.encode(px, 40, 32, fmt)
      val Some((dec, w, h)) = ImageCodec.decode(bytes)
      assert(w == 40 && h == 32)
      assert(ImageCodec.psnr(px, dec).contains(Double.PositiveInfinity), fmt)
    }
  }

  test("jpeg q=0.97 of smooth synth pixels stays above 40 dB") {
    for (id <- 0L until 20L) {
      val px = ImageCodec.synthPixels(id, 32, 32)
      val bytes = ImageCodec.encode(px, 32, 32, "jpeg", 0.97f)
      val Some((dec, _, _)) = ImageCodec.decode(bytes)
      val p = ImageCodec.psnr(px, dec).get
      assert(p >= 40.0, s"id=$id psnr=$p")
    }
  }

  test("noisy low-quality jpeg falls below 40 dB") {
    val px = ImageCodec.synthPixels(3L, 32, 32)
    val noisy = px.clone()
    noisy.indices.foreach { k =>
      if ((ImageCodec.mix64(3L * 1000003 + k) & 3) == 0) noisy(k) = noisy(k) ^ 0x7f7f7f
    }
    val bytes = ImageCodec.encode(noisy, 32, 32, "jpeg", 0.05f)
    val Some((dec, _, _)) = ImageCodec.decode(bytes)
    assert(ImageCodec.psnr(px, dec).get < 40.0)
  }

  test("magic-byte sniffing identifies png/jpeg/bmp; garbage → None") {
    val px = ImageCodec.synthPixels(1L, 24, 24)
    assert(ImageCodec.sniffFormat(ImageCodec.encode(px, 24, 24, "png")).contains("png"))
    assert(ImageCodec.sniffFormat(ImageCodec.encode(px, 24, 24, "jpeg")).contains("jpeg"))
    assert(ImageCodec.sniffFormat(ImageCodec.encode(px, 24, 24, "bmp")).contains("bmp"))
    assert(ImageCodec.sniffFormat(Array[Byte](0, 1, 2, 3, 4)).isEmpty)
    assert(ImageCodec.sniffFormat(null).isEmpty)
  }

  test("decode is total: corrupt/empty/null bytes → None, never throws") {
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    val junk = ImageCodec.encode(ImageCodec.synthPixels(9L, 24, 24), 24, 24, "jpeg")
      .take(12)
    junk(0) = 0x00
    assert(ImageCodec.decode(junk).isEmpty)
  }

  test("generator is parallelism-invariant: same row at any partitioning") {
    val a = ImageGen.genRow(123L, 16)
    val b = ImageGen.genRow(123L, 16)
    assert(a.image_id == b.image_id && a.phash == b.phash)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
  }
}
