package graft.multimodal

/** Structural decoders for the codec-less audio containers (mp3/ogg in a
  * stock JVM): REAL parsers over the public container specs — MPEG-1/2
  * audio frame headers (ISO/IEC 11172-3 §2.4.1 header layout) and Ogg
  * pages + the Vorbis identification header (RFC 3533 / Vorbis I spec) —
  * producing genuine per-payload features: sample rate, channel count,
  * duration, bitrate, frame/page counts, all read from the payload's own
  * framing. What they do NOT do is decode PCM samples (that needs a DSP
  * codec this JVM lacks), so rms/peak/zero-cross stay zero and the codec
  * names say `-headers`: a downstream pipeline can tell "structure
  * verified, content features present" apart from the JavaSound full
  * decode AND from the byte-stat stub. A payload whose framing does not
  * parse (no sync run, bad magic) is refused — it falls through the
  * registry to the flagged stub, never a fake.
  */
object HeaderCodecs {

  // ---- MPEG audio (mp3) frame-header walk --------------------------------

  // bitrate kbps tables, index 1..14 (0 = free, 15 = bad), Layer III
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SampleRateV1  = Array(44100, 48000, 32000)
  private val SampleRateV2  = Array(22050, 24000, 16000)
  private val SampleRateV25 = Array(11025, 12000, 8000)

  private final case class Frame(sampleRate: Int, channels: Int,
      bitrateKbps: Int, samples: Int, length: Int)

  /** Parse one Layer-III frame header at `off`; None unless a fully
    * valid (non-reserved, non-free-form) header starts there. */
  private def frameAt(b: Array[Byte], off: Int): Option[Frame] = {
    if (off + 4 > b.length) return None
    val b0 = b(off) & 0xFF; val b1 = b(off + 1) & 0xFF
    val b2 = b(off + 2) & 0xFF; val b3 = b(off + 3) & 0xFF
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
    val version = (b1 >> 3) & 3   // 0=V2.5, 1=reserved, 2=V2, 3=V1
    val layer = (b1 >> 1) & 3     // 1 = Layer III
    if (version == 1 || layer != 1) return None
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    val (kbps, sr, samples) = version match {
      case 3 => (BitrateV1L3(brIdx), SampleRateV1(srIdx), 1152)
      case 2 => (BitrateV2L3(brIdx), SampleRateV2(srIdx), 576)
      case _ => (BitrateV2L3(brIdx), SampleRateV25(srIdx), 576)
    }
    // Layer III frame byte length: floor(samples/8 * bitrate / rate) + pad
    val len = samples / 8 * (kbps * 1000) / sr + padding
    if (len < 4) None else Some(Frame(sr, channels, kbps, samples, len))
  }

  /** Skip a leading ID3v2 tag (syncsafe 28-bit size at offset 6). */
  private def skipId3(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      math.min(b.length, 10 + sz)
    } else 0

  /** Walk the frame chain from the first valid sync. Accepts the payload
    * only when ≥2 consecutive frames parse (a lone 0xFFEx bigram in
    * arbitrary bytes is common; a chained pair at the exact computed
    * frame length is the standard false-sync screen). Features:
    * [sampleRate, channels, durationSec, avgBitrateKbps, nFrames,
    *  vbr(0/1), 0, 0].
    */
  def decodeMpegHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    var off = skipId3(bytes)
    // find the first offset where two chained frames parse
    var first: Option[Frame] = None
    while (first.isEmpty && off + 4 <= bytes.length) {
      frameAt(bytes, off) match {
        case Some(f) if frameAt(bytes, off + f.length).isDefined ||
            off + f.length == bytes.length =>
          first = Some(f)
        case _ => off += 1
      }
    }
    first.map { f0 =>
      var (nFrames, samples, kbpsSum) = (0L, 0L, 0L)
      var vbr = false
      var cur = off
      var ok = true
      while (ok && cur + 4 <= bytes.length) {
        frameAt(bytes, cur) match {
          case Some(f) if f.sampleRate == f0.sampleRate =>
            nFrames += 1; samples += f.samples; kbpsSum += f.bitrateKbps
            if (f.bitrateKbps != f0.bitrateKbps) vbr = true
            cur += f.length
          case _ => ok = false
        }
      }
      val dur = samples.toFloat / f0.sampleRate
      Array(f0.sampleRate.toFloat, f0.channels.toFloat, dur,
        kbpsSum.toFloat / nFrames, nFrames.toFloat, if (vbr) 1f else 0f, 0f, 0f)
    }
  }

  // ---- Ogg container + Vorbis identification header ----------------------

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def leLong(b: Array[Byte], off: Int): Long =
    (0 until 8).map(i => (b(off + i) & 0xFFL) << (8 * i)).reduce(_ | _)

  private def isOggPage(b: Array[Byte], off: Int): Boolean =
    off + 27 <= b.length && b(off) == 'O' && b(off + 1) == 'g' &&
      b(off + 2) == 'g' && b(off + 3) == 'S' && b(off + 4) == 0

  /** Walk Ogg pages; read rate/channels/nominal bitrate from the Vorbis
    * identification header in the first page's first packet; duration
    * from the last page's granule position (PCM sample count, per the
    * Vorbis I mapping). Features: [sampleRate, channels, durationSec,
    * nominalKbps, nPages, 0, 0, 0]. Refuses payloads that don't start
    * with a valid page or whose first packet isn't a Vorbis id header.
    */
  def decodeOggHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    if (!isOggPage(bytes, 0)) return None
    // first page: segment table, then the first packet
    val nSeg0 = bytes(26) & 0xFF
    val body0 = 27 + nSeg0
    if (body0 + 7 > bytes.length) return None
    val p = body0
    val isVorbisId = bytes(p) == 1 && bytes(p + 1) == 'v' &&
      bytes(p + 2) == 'o' && bytes(p + 3) == 'r' && bytes(p + 4) == 'b' &&
      bytes(p + 5) == 'i' && bytes(p + 6) == 's'
    if (!isVorbisId || p + 28 > bytes.length) return None
    val channels = bytes(p + 11) & 0xFF
    val sampleRate = leInt(bytes, p + 12)
    val nominal = leInt(bytes, p + 20)
    if (sampleRate <= 0 || channels <= 0) return None
    var (off, nPages, lastGranule) = (0, 0L, 0L)
    var ok = true
    while (ok && isOggPage(bytes, off)) {
      nPages += 1
      val g = leLong(bytes, off + 6)
      if (g >= 0) lastGranule = math.max(lastGranule, g)
      val nSeg = bytes(off + 26) & 0xFF
      if (off + 27 + nSeg > bytes.length) ok = false
      else {
        var bodyLen = 0
        var i = 0
        while (i < nSeg) { bodyLen += bytes(off + 27 + i) & 0xFF; i += 1 }
        off += 27 + nSeg + bodyLen
      }
    }
    Some(Array(sampleRate.toFloat, channels.toFloat,
      lastGranule.toFloat / sampleRate, nominal.toFloat / 1000,
      nPages.toFloat, 0f, 0f, 0f))
  }

  /** MPEG-audio frame-header codec: claims the mp3 mimes JavaSound
    * refuses in a stock JVM. */
  object MpegHeaderCodec extends MediaOps.MediaCodec {
    val name = "mpeg-headers"
    def claims(mime: String): Boolean =
      mime == "audio/mpeg" || mime == "audio/mp3"
    def decode(bytes: Array[Byte]): Option[Array[Float]] =
      decodeMpegHeaders(bytes)
  }

  /** Ogg/Vorbis page codec. */
  object OggHeaderCodec extends MediaOps.MediaCodec {
    val name = "ogg-headers"
    def claims(mime: String): Boolean =
      mime == "audio/ogg" || mime == "application/ogg" || mime == "audio/vorbis"
    def decode(bytes: Array[Byte]): Option[Array[Float]] =
      decodeOggHeaders(bytes)
  }
}
