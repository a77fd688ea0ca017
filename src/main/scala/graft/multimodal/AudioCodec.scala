package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Real PCM-WAV audio codec — JDK-only (`javax.sound.sampled`, the audio
  * twin of ImageCodec's ImageIO): encode 16-bit mono PCM into a
  * RIFF/WAVE container, decode back through AudioSystem (a genuine
  * container + format parse, not a byte copy), and derive features
  * (sample count, RMS, a 64-bit band-energy fingerprint). This replaces
  * the round-2 audio STUB in [[BinaryPipeline]]; MJPEG video frames are
  * decoded for real too (stsz-sliced JPEG samples through ImageIO — see
  * [[Mp4Meta]]); only H.264/AV1 frame decode stays metadata-only, since
  * the JDK ships no such codec.
  *
  * Decode failure returns None, never throws: a corrupt payload becomes
  * a zeroed feature row, not a task failure (the suite's decode
  * philosophy, reference robust-sections behavior).
  */
object AudioCodec {

  /** Encode 16-bit mono PCM samples as a RIFF/WAVE byte payload. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1)                // PCM
    bb.putShort(1)                // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)     // byte rate
    bb.putShort(2)                // block align
    bb.putShort(16)               // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** True when the payload carries RIFF/WAVE magic (cheap sniff). */
  def sniffWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Decode a 16-bit mono PCM WAV payload → (samples, sampleRate). */
  def decodeWav(bytes: Array[Byte]): Option[(Array[Short], Int)] =
    if (bytes == null) None
    else try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val raw = in.readAllBytes()
          val n = raw.length / 2
          val out = new Array[Short](n)
          val bb = ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          Some((out, fmt.getSampleRate.toInt))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Integer RMS amplitude (deterministic: integer square sums, one final
    * sqrt floor).
    */
  def rmsInt(samples: Array[Short]): Int = {
    if (samples.isEmpty) return 0
    var acc = 0L
    var i = 0
    while (i < samples.length) { val s = samples(i).toLong; acc += s * s; i += 1 }
    math.sqrt(acc.toDouble / samples.length).toInt
  }

  /** 64-bit audio fingerprint: 64 equal windows, bit b set when window
    * b's energy exceeds window b−1's (bit 0 vs silence) — the
    * sign-of-delta-energy shape of published audio fingerprints, integer
    * energies so it is bit-deterministic.
    */
  def fingerprint64(samples: Array[Short]): Long = {
    if (samples.isEmpty) return 0L
    val win = math.max(1, samples.length / 64)
    val e = new Array[Long](64)
    var b = 0
    while (b < 64) {
      var i = b * win
      val end = math.min(samples.length, i + win)
      var acc = 0L
      while (i < end) { val s = samples(i).toLong; acc += s * s; i += 1 }
      e(b) = acc
      b += 1
    }
    var sig = 0L
    b = 0
    while (b < 64) {
      if (e(b) > (if (b == 0) 0L else e(b - 1))) sig |= 1L << b
      b += 1
    }
    sig
  }
}
