package graft.multimodal

import graft.SparkTestBase
import graft.images.ImageCodec

class BinaryPipelineSpec extends SparkTestBase {

  test("batched feature extraction: every kind handled, batches bounded") {
    val media = BinaryPipeline.synthMedia(spark, 500)
    val feats = BinaryPipeline.extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.batch_size <= BinaryPipeline.BatchSize))
    val byKind = feats.groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video"))
    assert(byKind("image").forall(f => f.feat_w == 32 && f.n_frames == 1 && f.sniffed == "png"))
    // audio is a REAL decode now: 2000 PCM16 samples @ 8 kHz through
    // javax.sound.sampled, nonzero RMS and fingerprint for a sine
    assert(byKind("audio").forall(f => f.sniffed == "wav-pcm16" &&
      f.n_frames == 2000 && f.feat_w == 8000 && f.feat_h > 0 && f.phash != 0L))
    // video rows are MJPEG tracks now: dims, frame count and phash come
    // from REAL frame decode (stsz-sliced JPEG samples through ImageIO)
    assert(byKind("video").forall(f => f.sniffed == "mp4-mjpeg" &&
      f.n_frames == 3 && f.feat_w == 64 && f.feat_h == 48 && f.phash != 0L))
  }

  test("MJPEG frames decode with real dims + per-frame phash; corrupt frames drop") {
    import spark.implicits._
    val frames = (0 until 4).map(f =>
      ImageCodec.encode(ImageCodec.synthPixels(100 + f, 48, 32), 48, 32, "jpg"))
    val ok = Mp4Meta.encodeMjpeg(48, 32, 4000, frames)
    assert(Mp4Meta.frames(ok).length == 4)
    // one frame's bytes garbled: that frame drops, the other three decode
    val garbled = frames.updated(2, Array.fill[Byte](frames(2).length)(0x11))
    val partial = Mp4Meta.encodeMjpeg(48, 32, 4000, garbled)
    // all frames garbled: zeroed feature row, never a failure
    val allBad = Mp4Meta.encodeMjpeg(48, 32, 4000,
      frames.map(fr => Array.fill[Byte](fr.length)(0x22)))
    val rows = Seq(
      BinaryPipeline.MediaRow("ok", "video", ok, 0, 0, 0),
      BinaryPipeline.MediaRow("part", "video", partial, 0, 0, 0),
      BinaryPipeline.MediaRow("bad", "video", allBad, 0, 0, 0)).toDS()
    val feats = BinaryPipeline.extractFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats("ok").sniffed == "mp4-mjpeg" && feats("ok").n_frames == 4 &&
      feats("ok").feat_w == 48 && feats("ok").feat_h == 32 && feats("ok").phash != 0L)
    assert(feats("part").sniffed == "mp4-mjpeg" && feats("part").n_frames == 3)
    assert(feats("bad").sniffed == "mp4-mjpeg-corrupt" && feats("bad").n_frames == 0 &&
      feats("bad").feat_w == 0 && feats("bad").phash == 0L)
    // per-frame sampling: one row per decoded frame, index preserves the
    // container position across the dropped frame
    val pf = BinaryPipeline.videoFramePhashes(rows).collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    assert(pf("ok").length == 4 && pf("ok").map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(pf("part").map(_._2).toSeq == Seq(0, 1, 3))
    assert(!pf.contains("bad"))
    assert(pf("ok").forall(r => r._3 == 48 && r._4 == 32))
    // phash comes from pixels: the same synthetic frame planted twice
    // hashes identically, different seeds hash differently
    assert(pf("ok").map(_._5).distinct.length > 1)
    assert(pf("part").map(_._5).toSeq == Seq(0, 1, 3).map(i => pf("ok")(i)._5))
  }

  test("metadata-only containers (no sample table) keep the no-decode path") {
    import spark.implicits._
    val meta = Mp4Meta.encode(640, 480, 5000,
      Array.tabulate[Byte](512)(k => (ImageCodec.mix64(k.toLong) & 0xff).toByte),
      withAudioTrack = true)
    assert(Mp4Meta.frames(meta).isEmpty)
    val rows = Seq(BinaryPipeline.MediaRow("m", "video", meta, 0, 0, 0)).toDS()
    val f = BinaryPipeline.extractFeatures(rows).collect()(0)
    assert(f.sniffed == "mp4-meta" && f.feat_w == 640 && f.feat_h == 480 &&
      f.n_frames == 5)
  }

  test("MP4 metadata round-trips; corrupt containers never fail") {
    val bytes = Mp4Meta.encode(1920, 1080, 123456, Array.fill[Byte](64)(7))
    assert(Mp4Meta.sniffMp4(bytes))
    assert(Mp4Meta.parse(bytes).contains((1920, 1080, 123456)))
    // multi-track: the 0x0 audio trak after the video trak (the layout of
    // virtually every real MP4) must not clobber the video dimensions
    val multi = Mp4Meta.encode(1280, 720, 9000, Array.fill[Byte](8)(1), withAudioTrack = true)
    assert(Mp4Meta.parse(multi).contains((1280, 720, 9000)))
    // corruption classes: truncation, garbage, bad box size
    assert(Mp4Meta.parse(bytes.take(30)).isEmpty)
    assert(Mp4Meta.parse(Array.fill[Byte](64)(0x33)).isEmpty)
    assert(Mp4Meta.parse(null).isEmpty)
    val badSize = bytes.clone(); badSize(0) = -1 // first box size becomes huge/negative
    assert(Mp4Meta.parse(badSize).isEmpty)
    import spark.implicits._
    val rows = Seq(
      BinaryPipeline.MediaRow("ok", "video", bytes, 0, 0, 0),
      BinaryPipeline.MediaRow("bad", "video", bytes.take(30), 0, 0, 0)).toDS()
    val feats = BinaryPipeline.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats(0).media_id == "bad" && feats(0).sniffed == "mp4-corrupt" && feats(0).feat_w == 0)
    assert(feats(1).media_id == "ok" && feats(1).sniffed == "mp4-meta" &&
      feats(1).feat_w == 1920 && feats(1).feat_h == 1080 && feats(1).n_frames == 123)
  }

  test("WAV codec round-trips samples exactly; corrupt payloads never fail") {
    val samples = Array.tabulate[Short](777)(k =>
      (math.sin(k / 7.0) * 9000).toShort)
    val bytes = AudioCodec.encodeWav(samples, 16000)
    assert(AudioCodec.sniffWav(bytes))
    val Some((back, rate)) = AudioCodec.decodeWav(bytes)
    assert(rate == 16000 && back.toSeq == samples.toSeq)
    // corruption classes: truncated header, garbage, valid-magic bad body
    assert(AudioCodec.decodeWav(bytes.take(10)).isEmpty)
    assert(AudioCodec.decodeWav(Array.fill[Byte](64)(0x5a)).isEmpty)
    assert(AudioCodec.decodeWav(null).isEmpty)
    val badBody = bytes.clone(); badBody(20) = 99 // format code != PCM
    assert(AudioCodec.decodeWav(badBody).isEmpty)
    // through the pipeline: a corrupt audio row yields a zeroed feature
    // row (task must not fail)
    import spark.implicits._
    val rows = Seq(
      BinaryPipeline.MediaRow("ok", "audio", bytes, 0, 0, 0),
      BinaryPipeline.MediaRow("bad", "audio", badBody, 0, 0, 0)).toDS()
    val feats = BinaryPipeline.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq("bad", "ok"))
    assert(feats(0).sniffed == "wav-corrupt" && feats(0).n_frames == 0)
    assert(feats(1).sniffed == "wav-pcm16" && feats(1).n_frames == 777)
  }

  test("feature extraction is deterministic across reruns") {
    val a = BinaryPipeline.extractFeatures(BinaryPipeline.synthMedia(spark, 200))
      .collect().sortBy(_.media_id).map(_.toString).toSeq
    val b = BinaryPipeline.extractFeatures(BinaryPipeline.synthMedia(spark, 200))
      .collect().sortBy(_.media_id).map(_.toString).toSeq
    assert(a == b)
  }

  test("resize produces decodable images at target dims") {
    val media = BinaryPipeline.synthMedia(spark, 60)
    val out = BinaryPipeline.resizeImages(media, 8, 8).collect()
    assert(out.nonEmpty)
    out.foreach { case (_, bytes) =>
      val Some((px, w, h)) = ImageCodec.decode(bytes)
      assert(w == 8 && h == 8 && px.length == 64)
    }
  }
}
