package graft.multimodal

import graft.images.{ImageCodec, Phash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed in fixed-size batches inside partitions — the Scala
  * twin of a `mapInPandas` Arrow-batch pipeline (the shape a Python
  * feature-extraction UDF would see). Image ops are real (ImageCodec,
  * ImageIO); audio is REAL (AudioCodec, javax.sound.sampled — RIFF/WAVE
  * PCM16 encode/decode + RMS + band-energy fingerprint); and since round
  * 5 video FRAME decode is REAL too: MJPEG tracks (JPEG samples in the
  * hand-rolled ISO BMFF container, sliced via the stsz sample table) are
  * decoded frame-by-frame through ImageIO — no stub remains. H.264/AV1
  * tracks would still need a codec the JDK does not ship; those
  * containers take the metadata-only path (moov parse, no decode).
  *
  * Scale design: payloads never cross a shuffle — every derived column is
  * computed in the scan stage, then `bytes` is dropped (SURVEY.md §7.4);
  * batches bound peak memory per task regardless of row width.
  */
object BinaryPipeline {

  val BatchSize = 64

  case class MediaRow(media_id: String, kind: String, bytes: Array[Byte],
                      meta_w: Int, meta_h: Int, duration_ms: Int)

  case class MediaFeatures(media_id: String, kind: String, n_bytes: Long,
                           sniffed: String, feat_w: Int, feat_h: Int,
                           n_frames: Int, phash: Long, batch_size: Int)

  /** Batched per-partition feature extraction. The iterator is consumed in
    * groups of [[BatchSize]] — mirroring Arrow record batches — so a
    * Python `mapInPandas` twin could drop in with identical semantics.
    */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val nb = if (r.bytes == null) 0L else r.bytes.length.toLong
          r.kind match {
            case "image" =>
              val sniff = ImageCodec.sniffFormat(r.bytes).getOrElse("none")
              ImageCodec.decode(r.bytes) match {
                case Some((px, w, h)) =>
                  MediaFeatures(r.media_id, r.kind, nb, sniff, w, h, 1,
                    Phash.phash64(px, w, h), batch.size)
                case None =>
                  MediaFeatures(r.media_id, r.kind, nb, sniff, 0, 0, 0, 0L, batch.size)
              }
            case "audio" =>
              // REAL decode (AudioCodec / javax.sound.sampled): for audio
              // rows, feat_w = sample rate, feat_h = integer RMS,
              // n_frames = sample count, phash = band-energy fingerprint.
              // Corrupt payloads decode to None → zeroed row, never a
              // task failure.
              AudioCodec.decodeWav(r.bytes) match {
                case Some((samples, rate)) =>
                  MediaFeatures(r.media_id, r.kind, nb, "wav-pcm16", rate,
                    AudioCodec.rmsInt(samples), samples.length,
                    AudioCodec.fingerprint64(samples), batch.size)
                case None =>
                  MediaFeatures(r.media_id, r.kind, nb,
                    if (AudioCodec.sniffWav(r.bytes)) "wav-corrupt" else "none",
                    0, 0, 0, 0L, batch.size)
              }
            case "video" =>
              // REAL container parse (Mp4Meta, hand-rolled ISO BMFF boxes)
              // AND real frame decode for MJPEG tracks: mdat sliced into
              // JPEG samples via the stsz table, each frame through
              // ImageIO — the r4 "video frame decode" stub is gone.
              // Containers WITHOUT a sample table keep the cheap
              // metadata-only path (dimensions + duration from moov,
              // frame-sample count from duration — the no-decode pattern
              // a 100 TB video column uses for stats passes). Corrupt
              // frames decode to None and are dropped from the count; an
              // all-corrupt track yields a zeroed row, never a task
              // failure.
              Mp4Meta.parse(r.bytes) match {
                case Some((w, h, durMs)) =>
                  val fr = Mp4Meta.frames(r.bytes)
                  if (fr.nonEmpty) {
                    val decoded = fr.flatMap(ImageCodec.decode)
                    decoded.headOption match {
                      case Some((px0, fw, fh)) =>
                        MediaFeatures(r.media_id, r.kind, nb, "mp4-mjpeg",
                          fw, fh, decoded.size, Phash.phash64(px0, fw, fh),
                          batch.size)
                      case None =>
                        MediaFeatures(r.media_id, r.kind, nb,
                          "mp4-mjpeg-corrupt", 0, 0, 0, 0L, batch.size)
                    }
                  } else
                    MediaFeatures(r.media_id, r.kind, nb, "mp4-meta", w, h,
                      math.max(1, durMs / 1000), payloadDigest(r.bytes), batch.size)
                case None =>
                  MediaFeatures(r.media_id, r.kind, nb,
                    if (Mp4Meta.sniffMp4(r.bytes)) "mp4-corrupt" else "none",
                    0, 0, 0, 0L, batch.size)
              }
            case _ =>
              MediaFeatures(r.media_id, r.kind, nb, "none", 0, 0, 0, 0L, batch.size)
          }
        }
      }
    }
  }

  /** Deterministic payload digest for the metadata-only (no-decode) path. */
  def payloadDigest(bytes: Array[Byte]): Long = {
    if (bytes == null) return 0L
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Per-frame sampling of MJPEG video rows: (media_id, frame_idx,
    * frame_w, frame_h, phash) — one row per DECODED frame (corrupt frames
    * are dropped, idx keeps the container position). The frame-sample
    * operator of SURVEY §2's multimodal set, now on real decoded pixels.
    */
  def videoFramePhashes(rows: Dataset[MediaRow]): Dataset[(String, Int, Int, Int, Long)] = {
    import rows.sparkSession.implicits._
    rows.filter(_.kind == "video").mapPartitions(_.flatMap { r =>
      Mp4Meta.frames(r.bytes).iterator.zipWithIndex.flatMap { case (f, i) =>
        ImageCodec.decode(f).map { case (px, w, h) =>
          (r.media_id, i, w, h, Phash.phash64(px, w, h))
        }
      }
    })
  }

  /** Resize (real, images only): decode → area-average to (tw, th) →
    * re-encode png. Stays in the scan stage.
    */
  def resizeImages(rows: Dataset[MediaRow], tw: Int, th: Int): Dataset[(String, Array[Byte])] = {
    import rows.sparkSession.implicits._
    rows.filter(_.kind == "image").mapPartitions(_.flatMap { r =>
      ImageCodec.decode(r.bytes).map { case (px, w, h) =>
        val out = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            out(y * tw + x) = px(math.min(h - 1, y * h / th) * w + math.min(w - 1, x * w / tw))
            x += 1
          }
          y += 1
        }
        (r.media_id, ImageCodec.encode(out, tw, th, "png"))
      }
    })
  }

  /** Deterministic synthetic media table (images real, audio/video fake). */
  def synthMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val m = ImageCodec.mix64(i)
      (math.abs(m) % 3) match {
        case 0 =>
          val px = ImageCodec.synthPixels(i, 32, 32)
          MediaRow(f"med-$i%08d", "image", ImageCodec.encode(px, 32, 32, "png"), 32, 32, 0)
        case 1 =>
          // REAL WAV payload: a deterministic sine at an id-derived
          // frequency, 0.25 s @ 8 kHz mono PCM16 (2000 samples).
          // StrictMath, not Math: Math.sin is 1-ulp and platform-
          // dependent (x86 intrinsics vs fdlibm), and a boundary sample
          // would flip RMS/fingerprint bits across hosts — StrictMath is
          // bit-identical everywhere (the repo's determinism discipline).
          val freq = 200.0 + (math.abs(m) % 20) * 50.0
          val samples = Array.tabulate[Short](2000)(k =>
            (StrictMath.sin(2 * StrictMath.PI * freq * k / 8000.0) * 12000).toShort)
          MediaRow(f"med-$i%08d", "audio", AudioCodec.encodeWav(samples, 8000), 0, 0, 250)
        case _ =>
          // REAL MJPEG-in-MP4: ftyp + moov(mvhd, trak(tkhd, mdia/minf/
          // stbl/stsz)) + mdat holding 3 actual JPEG frames (deterministic
          // synthetic pixels, id-seeded per frame) — frame count, dims and
          // per-frame phash are DECODED back, not trusted metadata
          val frames = (0 until 3).map(f =>
            ImageCodec.encode(ImageCodec.synthPixels(i * 3 + f, 64, 48), 64, 48, "jpg"))
          MediaRow(f"med-$i%08d", "video",
            Mp4Meta.encodeMjpeg(64, 48, 3000, frames, withAudioTrack = true), 64, 48, 3000)
      }
    }
  }
}
