package graft.images

import org.scalatest.funsuite.AnyFunSuite

class PhashSpec extends AnyFunSuite {

  test("identical pixels → hamming 0") {
    val px = ImageCodec.synthPixels(11L, 48, 36)
    assert(Phash.hamming(Phash.phash64(px, 48, 36), Phash.phash64(px, 48, 36)) == 0)
  }

  test("jpeg q=0.97 recompression moves pHash only slightly (≤ 10 bits)") {
    for (id <- 0L until 20L) {
      val px = ImageCodec.synthPixels(id, 32, 32)
      val a = Phash.phash64(px, 32, 32)
      val Some((dec, w, h)) = ImageCodec.decode(ImageCodec.encode(px, 32, 32, "jpeg", 0.97f))
      val b = Phash.phash64(dec, w, h)
      assert(Phash.hamming(a, b) <= 10, s"id=$id d=${Phash.hamming(a, b)}")
    }
  }

  test("different images → large hamming distance") {
    val a = Phash.phash64(ImageCodec.synthPixels(1L, 32, 32), 32, 32)
    val b = Phash.phash64(ImageCodec.synthPixels(999L, 32, 32), 32, 32)
    assert(Phash.hamming(a, b) > 10)
  }

  test("a 16-bit flip of the stored hash is detected (> threshold)") {
    val a = Phash.phash64(ImageCodec.synthPixels(5L, 32, 32), 32, 32)
    assert(Phash.hamming(a, a ^ 0xffff00ffL) == 24)
  }
}
