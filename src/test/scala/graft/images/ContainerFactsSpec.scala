package graft.images

import graft.SparkTestBase

/** The decode-free container walk against constructed containers: intact
  * encodes of all three formats must pass, truncations and scrambles must
  * fail, and on the generated corpus the gate must be NECESSARY (zero
  * false rejects vs the decoder) while actually saving decodes on the
  * planted corrupt/sentinel rows. */
class ContainerFactsSpec extends SparkTestBase {

  private def enc(fmt: String): Array[Byte] = {
    val px = ImageCodec.synthPixels(11L, 32, 24)
    ImageCodec.encode(px, 32, 24, fmt)
  }

  test("intact containers of all three formats pass with the right kind") {
    Seq("jpeg", "png", "bmp").foreach { fmt =>
      val (kind, ok) = ImageCodec.containerFacts(enc(fmt))
      assert(kind == fmt && ok, s"$fmt: ($kind, $ok)")
    }
  }

  test("truncation fails every format, kind still sniffed") {
    Seq("jpeg", "png", "bmp").foreach { fmt =>
      val b = enc(fmt)
      val t = b.take(b.length / 2)
      val (kind, ok) = ImageCodec.containerFacts(t)
      assert(kind == fmt && !ok, s"truncated $fmt: ($kind, $ok)")
    }
  }

  test("the generator's corrupt recipe is caught without decoding") {
    val b = enc("jpeg")
    val junk = b.take(math.max(8, b.length / 3))
    junk(0) = 0x00; junk(1) = 0x11
    val (kind, ok) = ImageCodec.containerFacts(junk)
    assert(kind == "unknown" && !ok)
    assert(ImageCodec.containerFacts(Array.emptyByteArray) == ("none", false))
    assert(ImageCodec.containerFacts(null) == ("none", false))
  }

  test("gate is necessary on the generated corpus: zero false rejects, real savings") {
    val rows = graft.validation.ImageSuiteQueries.queries("q_i_container")(
      spark, "/x/sf0.0005").collect()
    assert(rows.nonEmpty)
    var saved = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_false_reject") == 0L,
        s"part ${r.getAs[String]("part")}: container gate rejected decodable bytes")
      assert(r.getAs[Boolean]("pass"))
      saved += r.getAs[Long]("n_pregate_saved")
    }
    assert(saved > 0L, "gate saved no decodes — planted corrupt rows missed")
  }
}
