package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MP4 (ISO BMFF) container METADATA codec — hand-rolled box
  * writer/parser, no codec library. This is the real 100 TB pattern for
  * video columns: duration/dimensions come from a cheap container parse
  * of the `moov` header (mvhd + tkhd boxes), while FRAME decode — which
  * would need an H.264/AV1 codec the JDK does not ship — stays stubbed.
  * Box layout per ISO/IEC 14496-12 (public spec): length-prefixed
  * [size:u32][type:4cc] boxes, big-endian; mvhd v0 carries
  * timescale/duration, tkhd v0 carries 16.16-fixed width/height.
  *
  * Parse failure returns None, never throws (corrupt payload → zeroed
  * feature row, the suite's decode philosophy).
  */
object Mp4Meta {

  private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + body.length); bb.put(tpe.getBytes("US-ASCII")); bb.put(body)
    bb.array()
  }

  /** stsz sample-size box (version 0, varied sizes) — the table that makes
    * mdat sliceable into frames (ISO/IEC 14496-12 §8.7.3.2). */
  private def stsz(sizes: Seq[Int]): Array[Byte] = box("stsz", {
    val bb = ByteBuffer.allocate(12 + 4 * sizes.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0)             // version 0 + flags
    bb.putInt(0)             // sample_size 0 = per-sample table follows
    bb.putInt(sizes.length)  // sample_count
    sizes.foreach(bb.putInt)
    bb.array()
  })

  /** MJPEG encode: the same container skeleton with the video trak carrying
    * a real sample table (mdia/minf/stbl/stsz) and mdat holding the JPEG
    * frame payloads back-to-back — frame boundaries come from stsz, exactly
    * how an MJPEG-in-MP4 track is laid out. This is what turned the r4
    * "video frame decode" stub into a real decode: JPEG frames need no
    * codec beyond ImageIO.
    */
  def encodeMjpeg(w: Int, h: Int, durationMs: Int, frames: Seq[Array[Byte]],
                  withAudioTrack: Boolean = false): Array[Byte] =
    encodeWith(w, h, durationMs, frames.flatten.toArray,
      Some(frames.map(_.length)), withAudioTrack)

  /** Encode a structurally valid MP4 skeleton: ftyp + moov(mvhd,
    * trak(tkhd)[, trak(tkhd 0×0 soundtrack)]) + mdat with the given
    * payload. `withAudioTrack` appends the 0×0 audio trak real MP4s
    * carry after the video trak (exercises first-nonzero-track
    * selection in [[parse]]).
    */
  def encode(w: Int, h: Int, durationMs: Int, mdat: Array[Byte],
             withAudioTrack: Boolean = false): Array[Byte] =
    encodeWith(w, h, durationMs, mdat, None, withAudioTrack)

  private def encodeWith(w: Int, h: Int, durationMs: Int, mdat: Array[Byte],
                         sampleSizes: Option[Seq[Int]],
                         withAudioTrack: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(12)
      bb.put("isom".getBytes); bb.putInt(0); bb.put("isom".getBytes); bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0)            // version 0 + flags
      bb.putInt(0); bb.putInt(0) // ctime, mtime
      bb.putInt(1000)         // timescale: ms
      bb.putInt(durationMs)   // duration in timescale units
      bb.putInt(0x00010000)   // rate 1.0
      bb.putShort(0x0100.toShort) // volume 1.0
      bb.position(bb.position() + 10) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt) // identity matrix
      bb.position(bb.position() + 24) // predefined
      bb.putInt(2)            // next track id
      bb.array()
    })
    def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd", {
      val bb = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(7)            // version 0 + flags (enabled|in-movie|in-preview)
      bb.putInt(0); bb.putInt(0) // ctime, mtime
      bb.putInt(trackId)
      bb.putInt(0)            // reserved
      bb.putInt(durationMs)   // duration
      bb.putLong(0L)          // reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0) // layer, group, volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(tw << 16)     // 16.16 fixed width
      bb.putInt(th << 16)     // 16.16 fixed height
      bb.array()
    })
    // the sample table rides the video trak under the standard
    // mdia/minf/stbl chain
    val stbl = sampleSizes.map(sz =>
      box("mdia", box("minf", box("stbl", stsz(sz)))))
      .getOrElse(Array.empty[Byte])
    val traks = box("trak", tkhd(1, w, h) ++ stbl) ++
      (if (withAudioTrack) box("trak", tkhd(2, 0, 0)) else Array.empty[Byte])
    val moov = box("moov", mvhd ++ traks)
    ftyp ++ moov ++ box("mdat", mdat)
  }

  /** True when the payload opens with a well-formed ftyp box. */
  def sniffMp4(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private case class Parsed(w: Int, h: Int, durationMs: Int,
                            sampleSizes: Seq[Int], mdatOff: Int, mdatLen: Int)

  /** Full box walk: moov header fields, the video trak's stsz sample
    * table (if any), and the mdat payload extent. */
  private def parseAll(bytes: Array[Byte]): Option[Parsed] =
    if (bytes == null || bytes.length < 8) None
    else try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      var durationMs = -1
      var w = -1; var h = -1
      var sizes: Seq[Int] = Nil
      var mdatOff = -1; var mdatLen = -1

      def walk(start: Int, end: Int, depth: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val size = bb.getInt(p)
          if (size < 8 || p + size > end) return // malformed: stop cleanly
          val tpe = new String(bytes, p + 4, 4, "US-ASCII")
          tpe match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" if depth < 8 =>
              walk(p + 8, p + size, depth + 1)
            case "mvhd" if size >= 32 && bytes(p + 8) == 0 =>
              val timescale = bb.getInt(p + 20)
              val duration = bb.getInt(p + 24)
              if (timescale > 0) durationMs = (duration.toLong * 1000 / timescale).toInt
            case "tkhd" if size >= 92 && bytes(p + 8) == 0 =>
              // real MP4s carry several traks (video first, then audio
              // whose tkhd is 0×0): keep the FIRST track with nonzero
              // dimensions, never overwrite it with a later soundtrack
              val tw = bb.getInt(p + 84) >>> 16
              val th = bb.getInt(p + 88) >>> 16
              if (w <= 0 || h <= 0) { w = tw; h = th }
            case "stsz" if size >= 20 && bytes(p + 8) == 0 && sizes.isEmpty =>
              val n = bb.getInt(p + 16)
              if (n >= 0 && 20L + 4L * n <= size)
                sizes = (0 until n).map(i => bb.getInt(p + 20 + 4 * i))
            case "mdat" =>
              mdatOff = p + 8; mdatLen = size - 8
            case _ => ()
          }
          p += size
        }
      }
      walk(0, bytes.length, 0)
      if (durationMs >= 0 && w >= 0 && h >= 0)
        Some(Parsed(w, h, durationMs, sizes, mdatOff, mdatLen))
      else None
    } catch { case _: Exception => None }

  /** Parse (width, height, durationMs) from the moov header. */
  def parse(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    parseAll(bytes).map(p => (p.w, p.h, p.durationMs))

  /** Frame payloads sliced from mdat via the stsz sample table; empty when
    * the container carries no sample table (metadata-only skeleton) or the
    * table disagrees with the mdat extent (malformed — never throws).
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
    parseAll(bytes) match {
      case Some(p) if p.sampleSizes.nonEmpty && p.mdatOff >= 0 &&
          p.sampleSizes.forall(_ >= 0) &&
          p.sampleSizes.map(_.toLong).sum <= p.mdatLen =>
        val offs = p.sampleSizes.scanLeft(p.mdatOff)(_ + _)
        p.sampleSizes.indices.map(i =>
          java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + 1)))
      case _ => Seq.empty
    }
}
