package graft.multimodal

import graft.multimodal.MediaOps.MediaCodec

/** Compressed-audio CONTENT decode (r20 — the r19 verdict's last
  * honest-zero modality tier): IMA ADPCM in WAV (wFormatTag 0x0011,
  * DVI/IMA 4-bit, 4:1 compression — the classic compressed-WAV payload
  * of telephony and game audio), FULLY decoded to PCM samples pure-JVM.
  * The stock `javax.sound.sampled` registry reads only PCM/μ-law/A-law
  * WAVs, so [[MediaOps.JavaSoundCodec]] returns None for these and this
  * codec is the next claimant in the route; before it, ADPCM blobs fell
  * through to structural/byte-stat tiers with zeroed content stats.
  *
  * The algorithm is the public IMA/DVI specification (the 89-entry step
  * table + 8-entry index table): per channel each block carries a
  * 4-byte header (int16 predictor — which IS the block's first output
  * sample, Microsoft's `wSamplesPerBlock = (blockAlign − 4·ch)·2/ch + 1`
  * counts it — plus a step index), then 4-bit deltas, low nibble first,
  * stereo interleaved in 4-byte-per-channel groups.
  *
  * Output layout matches [[MediaOps.decodeAudio]] exactly —
  * [sampleRate, channels, durationSec, rms, peak, zeroCrossRate, 0, 0]
  * — so downstream feature consumers cannot tell which decoder ran;
  * sample reads are bounded (first ~1M samples, the shared discipline)
  * and any structural violation refuses with None (→ header/stub
  * tiers, flagged), never a task failure.
  */
object AdpcmCodec extends MediaCodec {
  val name = "ima-adpcm"
  def claims(mime: String): Boolean = {
    val m = mime.toLowerCase
    // WAV-family mimes; PCM WAVs were already decoded by JavaSound
    // upstream, so reaching here means a non-PCM WAV payload
    m.startsWith("audio/wav") || m.startsWith("audio/x-wav") ||
      m.startsWith("audio/wave") || m.startsWith("audio/vnd.wave") ||
      m.startsWith("audio/adpcm") || m.startsWith("audio/x-adpcm")
  }

  /** IMA step table — 89 entries, fixed by the spec. */
  private val Steps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per 3-bit magnitude — the spec's second table. */
  private val IndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private val MaxSamples = 1 << 20

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def s16(b: Array[Byte], i: Int): Int = u16(b, i).toShort.toInt
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong) | (u16(b, i + 2).toLong << 16)

  /** One decoded nibble: (newPredictor, newIndex). */
  private def step(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val st = Steps(index)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    val p0 = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val ix = math.max(0, math.min(88, index + IndexAdj(nibble & 7)))
    (p, ix)
  }

  /** RIFF walk → (fmt chunk offset, data offset, data size, fact
    * samples or -1), or None when the container isn't an IMA-ADPCM WAV.
    */
  private def chunks(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')) return None
    var p = 12
    var fmt = -1; var dataOff = -1; var dataLen = -1; var fact = -1L
    while (p + 8 <= b.length && (fmt < 0 || dataOff < 0)) {
      val id = new String(b, p, 4, "US-ASCII")
      val len = u32(b, p + 4)
      val avail = (b.length - p - 8).toLong
      id match {
        // a data chunk whose declared length overruns the blob CLAMPS:
        // a truncated payload still decodes its complete prefix blocks
        // (refusal-by-design is for structure we cannot trust, not for
        // a short read)
        case "data" => dataOff = p + 8; dataLen = math.min(len, avail).toInt
        // fmt must DECLARE the 16 base format bytes we read — a shorter
        // declaration would make the field reads below run into the
        // NEXT chunk's header bytes and decode garbage as features
        case "fmt " => if (len > avail || len < 16) return None else fmt = p + 8
        case "fact" => if (len >= 4 && avail >= 4) fact = u32(b, p + 8)
        case _ => if (len > avail) return None // torn non-data chunk
      }
      // word-aligned hop; clamp so a truncated final chunk ends the walk
      p += 8 + math.min(len + (len & 1L), avail).toInt
    }
    if (fmt < 0 || dataOff < 0) None else Some((fmt, dataOff, dataLen, fact))
  }

  def decode(bytes: Array[Byte]): Option[Array[Float]] = try {
    val (fmt, dataOff, dataLen, factSamples) = chunks(bytes) match {
      case Some(t) => t
      case None => return None
    }
    if (fmt + 16 > bytes.length) return None
    val tag = u16(bytes, fmt)
    if (tag != 0x0011) return None // IMA/DVI ADPCM only — this codec's claim
    val ch = u16(bytes, fmt + 2)
    val rate = u32(bytes, fmt + 4)
    val blockAlign = u16(bytes, fmt + 12)
    val bps = u16(bytes, fmt + 14)
    if (ch < 1 || ch > 2 || rate <= 0 || bps != 4 ||
        blockAlign < 4 * ch + 4 || dataLen < 4 * ch) return None
    // Microsoft's layout constant: header sample + 8 samples per 4-byte
    // nibble group per channel
    val samplesPerBlock = (blockAlign - 4 * ch) * 2 / ch + 1
    val nBlocks = dataLen / blockAlign
    val tailBytes = dataLen % blockAlign
    // samples in a trailing partial block (header + whole nibble groups)
    val tailSamples =
      if (tailBytes >= 4 * ch + 4 * ch) ((tailBytes - 4 * ch) / (4 * ch)) * 8 + 1
      else if (tailBytes >= 4 * ch) 1
      else 0
    val totalPerCh =
      if (factSamples >= 0) factSamples
      else nBlocks.toLong * samplesPerBlock + tailSamples
    val durationSec = totalPerCh.toDouble / rate
    var (sumSq, n, crossings) = (0.0, 0L, 0L)
    var peak = 0.0
    val prevNeg = new Array[Boolean](ch)
    val seen = new Array[Boolean](ch)
    def emit(c: Int, sample: Int): Unit = {
      val s = sample / 32768.0
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      val neg = s < 0
      if (seen(c) && neg != prevNeg(c)) crossings += 1
      prevNeg(c) = neg; seen(c) = true
      n += 1
    }
    var blockStart = dataOff
    val dataEnd = dataOff + dataLen
    while (blockStart + 4 * ch <= dataEnd && n < MaxSamples) {
      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        pred(c) = s16(bytes, blockStart + 4 * c)
        idx(c) = math.max(0, math.min(88, bytes(blockStart + 4 * c + 2) & 0xFF))
        emit(c, pred(c)) // the header predictor IS sample 0
        c += 1
      }
      // nibble data: 4-byte groups per channel, interleaved; low nibble
      // first within each byte
      var g = blockStart + 4 * ch
      val blockEnd = math.min(blockStart.toLong + blockAlign, dataEnd.toLong).toInt
      while (g + 4 * ch <= blockEnd && n < MaxSamples) {
        c = 0
        while (c < ch) {
          var i = 0
          while (i < 4) {
            val byte = bytes(g + 4 * c + i) & 0xFF
            val (p1, x1) = step(byte & 0xF, pred(c), idx(c))
            pred(c) = p1; idx(c) = x1; emit(c, p1)
            val (p2, x2) = step(byte >> 4, pred(c), idx(c))
            pred(c) = p2; idx(c) = x2; emit(c, p2)
            i += 1
          }
          c += 1
        }
        g += 4 * ch
      }
      blockStart += blockAlign
    }
    if (n == 0) return None
    val rms = math.sqrt(sumSq / n)
    val nSeen = seen.count(identity)
    val zcr = if (n > nSeen) crossings.toDouble / (n - nSeen) else 0.0
    Some(Array(rate.toFloat, ch.toFloat, durationSec.toFloat,
      rms.toFloat, peak.toFloat, zcr.toFloat, 0f, 0f))
  } catch { // hostile blobs land in the stub tier, never fail the task
    case scala.util.control.NonFatal(_) => None
  }
}
