package graft.functions

import graft.SparkTestBase
import graft.images.ImageGen
import graft.validation.ImageSuite

class ImageFactsExprSpec extends SparkTestBase {

  test("native image_facts expression ≡ mapPartitions decode stage") {
    val dir = ImageGen.ensure(spark, 2000L, "target/test-images")
    val images = ImageGen.images(spark, dir)
    val cols = Seq("image_id", "part", "fmt", "caption", "w", "h", "phash",
      "has_bytes", "n_bytes", "decode_ok", "dec_w", "dec_h",
      "phash_rec", "phash_hamming", "fmt_sniffed", "caption_expected")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr(cols :+ "round(psnr_db, 6) as psnr_r": _*)
        .orderBy("image_id", "part").collect().map(_.toString).toSeq
    val a = canon(ImageSuite.decodeFacts(spark, images).toDF())
    val b = canon(ImageSuite.decodeFactsExpr(images))
    assert(a.size == b.size && a.size == 2000)
    assert(a == b)
  }

  test("expression is total on nulls and garbage") {
    import spark.implicits._
    val df = Seq(
      (null.asInstanceOf[Array[Byte]], "img-000000000001"),
      (Array[Byte](1, 2, 3), "not-an-id"),
      (Array.emptyByteArray, "img-000000000002"))
      .toDF("bytes", "image_id")
    val out = df.select(ImageFactsExpr.imageFacts($"bytes", $"image_id").as("f"))
      .select("f.decode_ok", "f.has_bytes", "f.fmt_sniffed").collect()
    assert(out.forall(!_.getBoolean(0)))
    assert(out.map(_.getBoolean(1)).toSeq == Seq(false, true, false))
  }
}
