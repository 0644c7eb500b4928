package graft.io.binary

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** Real WAV/PCM audio decode via the JDK-builtin `javax.sound.sampled`
  * stack — no external codec needed. Produces a fixed-`dim` feature
  * vector with a documented layout:
  *
  * {{{ [durationSec, sampleRateHz, channels, overallRms, env_0 … env_{dim-5}] }}}
  *
  * where `env_i` is the RMS of the i-th of `dim - 4` equal-length segments
  * of the mono-mixed signal (a coarse loudness envelope). Samples are
  * normalized to [-1, 1]; multi-channel audio is averaged to mono. A real
  * embedding model would replace the envelope tail; the header fields and
  * the decode itself are exact.
  *
  * Formats: anything `AudioSystem` can read or convert — PCM signed /
  * unsigned / float, 8/16/24/32-bit, any rate or channel count — is first
  * converted to 16-bit signed PCM at the source rate and channel count.
  * Returns None for payloads that are not decodable audio (the caller
  * decides between stub fallback and failure).
  */
object AudioFeatures {

  /** Hard cap on decoded samples per payload (per-channel frames ×
    * channels): 64M samples = 128 MB of 16-bit PCM ≈ 2,200 s of stereo
    * 44.1 kHz. A corrupt or adversarial header cannot make one row
    * allocate unboundedly. */
  val MaxSamples: Long = 64L * 1024 * 1024

  /** Decode to mono [-1, 1] samples + (rate, channels) — the shared
    * front half of [[decodeWavFeatures]] and
    * [[AudioFingerprint.fp64]]. None for anything undecodable. */
  private[binary] def decodeMono(
      bytes: Array[Byte]): Option[(Array[Double], Float, Int)] = {
    if (bytes == null || bytes.length < 12) return None
    var in: AudioInputStream = null
    var pcm: AudioInputStream = null
    try {
      in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      pcm = if (src.matches(target)) in
            else AudioSystem.getAudioInputStream(target, in)
      val channels = target.getChannels
      val frames = pcm.getFrameLength
      if (frames <= 0 || frames * channels > MaxSamples) return None
      val n = frames.toInt
      // read everything, little-endian 16-bit, mix channels to mono [-1,1]
      val raw = pcm.readAllBytes()
      if (raw.length < n * channels * 2) return None
      val mono = new Array[Double](n)
      var f = 0
      while (f < n) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val o = (f * channels + c) * 2
          val s = ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
          acc += s / 32768.0
          c += 1
        }
        mono(f) = acc / channels
        f += 1
      }
      Some((mono, target.getSampleRate, channels))
    } catch {
      case _: Exception => None
    } finally {
      if (pcm != null && (pcm ne in)) pcm.close()
      if (in != null) in.close()
    }
  }

  def decodeWavFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (dim < 5) return None
    decodeMono(bytes).map { case (mono, rate, channels) =>
      val n = mono.length
      val out = new Array[Float](dim)
      out(0) = (n / rate)
      out(1) = rate
      out(2) = channels.toFloat
      var sq = 0.0
      var i = 0
      while (i < n) { sq += mono(i) * mono(i); i += 1 }
      out(3) = math.sqrt(sq / n).toFloat
      val segs = dim - 4
      var s = 0
      while (s < segs) {
        val lo = (s.toLong * n / segs).toInt
        val hi = ((s + 1).toLong * n / segs).toInt
        var acc = 0.0
        var j = lo
        while (j < hi) { acc += mono(j) * mono(j); j += 1 }
        out(4 + s) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0f
        s += 1
      }
      out
    }
  }
}
