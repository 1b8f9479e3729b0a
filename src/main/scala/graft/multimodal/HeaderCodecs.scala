package graft.multimodal

/** Structural decoders for the codec-less media containers (mp3/ogg/mp4
  * in a stock JVM): REAL parsers over the public container specs — MPEG-1/2
  * audio frame headers (ISO/IEC 11172-3 §2.4.1 header layout), Ogg
  * pages + the Vorbis identification header (RFC 3533 / Vorbis I spec),
  * and ISO base-media-file-format boxes (ISO/IEC 14496-12: ftyp/moov/
  * mvhd/trak/tkhd/hdlr — the mp4/quicktime/m4a family) —
  * producing genuine per-payload features: sample rate, channel count,
  * duration, bitrate, frame/page/track counts, video dimensions, all
  * read from the payload's own
  * framing. What they do NOT do is decode PCM samples or pixel data
  * (that needs a DSP/video codec this JVM lacks), so content statistics
  * stay zero and the codec
  * names say `-headers`: a downstream pipeline can tell "structure
  * verified, container features present" apart from the JavaSound full
  * decode AND from the byte-stat stub. A payload whose framing does not
  * parse (no sync run, bad magic, malformed box chain) is refused — it
  * falls through the
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
      bitrateKbps: Int, samples: Int, length: Int, version: Int,
      crcBytes: Int)

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
    if (len < 4) None
    else Some(Frame(sr, channels, kbps, samples, len, version,
      crcBytes = if ((b1 & 1) == 0) 2 else 0))
  }

  /** The frame's `global_gain` fields (one per granule per channel),
    * read from the Layer-III side information at their fixed bit
    * offsets (ISO/IEC 11172-3 §2.4.1.7 / the LSF variant): MPEG-1 =
    * main_data_begin(9) + private(5 mono / 3 stereo) + scfsi(4·ch),
    * then 59-bit per-(granule, channel) blocks with global_gain 21 bits
    * in; MPEG-2/2.5 = main_data_begin(8) + private(1/2), 63-bit blocks,
    * same +21. global_gain is the granule's quantizer step exponent —
    * a REAL monotone per-frame energy proxy read without any Huffman or
    * filterbank work (loud granules need coarser steps), which is what
    * moves the mp3 tier's content slots off honest-zero (r20). Empty
    * when the frame is too short to hold its side info.
    */
  private def globalGains(b: Array[Byte], off: Int, f: Frame): Seq[Int] = {
    val si = off + 4 + f.crcBytes // side info start (byte offset)
    val ch = f.channels
    val (startBit, blockBits, blocks) =
      if (f.version == 3) (9 + (if (ch == 1) 5 else 3) + 4 * ch, 59, 2 * ch)
      else (8 + (if (ch == 1) 1 else 2), 63, ch)
    def bits8(bitOff: Int): Int = { // 8 bits starting bitOff from si
      val byteOff = si + (bitOff >> 3)
      if (byteOff + 2 > b.length || byteOff + 2 > off + f.length) return -1
      val w = ((b(byteOff) & 0xFF) << 8) | (b(byteOff + 1) & 0xFF)
      (w >> (8 - (bitOff & 7))) & 0xFF
    }
    (0 until blocks).map(i => bits8(startBit + i * blockBits + 21))
      .filter(_ >= 0)
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
    * frame length is the standard false-sync screen). The rule is
    * UNCONDITIONAL (r17): a single frame whose computed length happens to
    * land exactly at EOF is refused too — a real sub-30ms one-frame mp3
    * is not worth weakening the screen on arbitrary bytes for. Features:
    * [sampleRate, channels, durationSec, avgBitrateKbps, nFrames,
    *  vbr(0/1), gainMean, gainStd] — the last two are the per-granule
    * `global_gain` quantizer exponents (see [[globalGains]]) normalized
    * by 255: a genuine energy-dynamics signal (a constant tone reads
    * std ≈ 0, real program material fluctuates) read from the side
    * info alone; full PCM content stats still need a DSP codec, so the
    * codec name keeps saying `-headers`.
    */
  def decodeMpegHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    var off = skipId3(bytes)
    // find the first offset where two chained frames parse
    var first: Option[Frame] = None
    while (first.isEmpty && off + 4 <= bytes.length) {
      frameAt(bytes, off) match {
        case Some(f) if frameAt(bytes, off + f.length).isDefined =>
          first = Some(f)
        case _ => off += 1
      }
    }
    first.map { f0 =>
      var (nFrames, samples, kbpsSum) = (0L, 0L, 0L)
      var vbr = false
      var (gSum, gSq, gN) = (0.0, 0.0, 0L)
      var cur = off
      var ok = true
      while (ok && cur + 4 <= bytes.length) {
        frameAt(bytes, cur) match {
          case Some(f) if f.sampleRate == f0.sampleRate =>
            nFrames += 1; samples += f.samples; kbpsSum += f.bitrateKbps
            if (f.bitrateKbps != f0.bitrateKbps) vbr = true
            globalGains(bytes, cur, f).foreach { g =>
              gSum += g; gSq += g.toDouble * g; gN += 1
            }
            cur += f.length
          case _ => ok = false
        }
      }
      val dur = samples.toFloat / f0.sampleRate
      val gMean = if (gN > 0) gSum / gN else 0.0
      val gStd =
        if (gN > 0) math.sqrt(math.max(0.0, gSq / gN - gMean * gMean)) else 0.0
      Array(f0.sampleRate.toFloat, f0.channels.toFloat, dur,
        kbpsSum.toFloat / nFrames, nFrames.toFloat, if (vbr) 1f else 0f,
        (gMean / 255.0).toFloat, (gStd / 255.0).toFloat)
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

  // ---- ISO base media file format (mp4/mov/m4a) box walk -----------------

  private def beInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def beLong(b: Array[Byte], off: Int): Long =
    (0 until 8).map(i => (b(off + i) & 0xFFL) << (8 * (7 - i))).reduce(_ | _)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "ISO-8859-1")

  /** One ISO-BMFF box at `off` inside [off, end): (type, bodyStart,
    * boxEnd). size==1 → 64-bit largesize follows the type; size==0 →
    * box runs to `end` — but ONLY when `topLevel` (ISO/IEC 14496-12
    * §4.2 permits size 0 solely for the final top-level box; r17 — a
    * corrupt INNER box claiming size 0 previously swallowed its
    * siblings instead of refusing the payload). None on a size that
    * over/under-runs the window — a malformed chain refuses the payload
    * rather than mis-walking into garbage. */
  private def boxAt(b: Array[Byte], off: Int, end: Int,
      topLevel: Boolean): Option[(String, Int, Int)] = {
    if (off + 8 > end) return None
    val size32 = beInt(b, off)
    val typ = fourcc(b, off + 4)
    val (bodyStart, boxEnd) =
      if (size32 == 1L) {
        if (off + 16 > end) return None
        val sz = beLong(b, off + 8)
        if (sz < 16 || off + sz > end) return None
        (off + 16, off + sz.toInt)
      } else if (size32 == 0L) {
        if (!topLevel) return None
        (off + 8, end)
      } else {
        if (size32 < 8 || off + size32 > end) return None
        (off + 8, off + size32.toInt)
      }
    Some((typ, bodyStart, boxEnd))
  }

  /** Walk the direct children of [start, end), invoking `f` per box. */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int,
      topLevel: Boolean = false)(
      f: (String, Int, Int) => Unit): Boolean = {
    var off = start
    while (off < end) {
      boxAt(b, off, end, topLevel) match {
        case Some((typ, bodyStart, boxEnd)) =>
          f(typ, bodyStart, boxEnd); off = boxEnd
        case None => return false
      }
    }
    true
  }

  /** Walk the ISO-BMFF box tree (mp4/quicktime/m4a family). Requires
    * `ftyp` as the FIRST box (the standard container sniff) and a
    * well-formed top-level chain; reads movie duration/timescale from
    * `moov/mvhd` (version 0 and 1 layouts), per-track presentation
    * dimensions from `trak/tkhd` (16.16 fixed point), and the
    * video/audio track split from each track's `mdia/hdlr` handler type
    * (`vide`/`soun`). Features: [width, height, durationSec, nTracks,
    * nVideoTracks, nAudioTracks, nTopLevelBoxes, timescale] — width/
    * height are the largest video track's. Refuses payloads without a
    * leading ftyp, without a parseable mvhd, or whose box sizes don't
    * tile their parent exactly.
    */
  def decodeBmffHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 16) return None
    val first = boxAt(bytes, 0, bytes.length, topLevel = true)
    if (!first.exists(_._1 == "ftyp")) return None
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var nVideo = 0
    var nAudio = 0
    var nTop = 0
    var (width, height) = (0f, 0f)
    var sawMvhd = false
    var innerOk = true // a malformed chain ANYWHERE refuses the payload
    val wellFormed = walkBoxes(bytes, 0, bytes.length, topLevel = true) { (typ, bs, be) =>
      nTop += 1
      if (typ == "moov") {
        innerOk &= walkBoxes(bytes, bs, be) { (t2, b2, e2) =>
          if (t2 == "mvhd" && e2 - b2 >= 20) {
            val version = bytes(b2) & 0xFF
            if (version == 1 && e2 - b2 >= 32) {
              timescale = beInt(bytes, b2 + 20)
              duration = beLong(bytes, b2 + 24)
              sawMvhd = true
            } else if (version == 0) {
              timescale = beInt(bytes, b2 + 12)
              duration = beInt(bytes, b2 + 16)
              sawMvhd = true
            }
          } else if (t2 == "trak") {
            nTracks += 1
            var (tw, th) = (0f, 0f)
            var handler = ""
            innerOk &= walkBoxes(bytes, b2, e2) { (t3, b3, e3) =>
              // version/flags must be present before any field read — an
              // empty-body tkhd is a refusal, not an ArrayIndexOutOfBounds
              if (t3 == "tkhd" && e3 - b3 >= 4) {
                val version = bytes(b3) & 0xFF
                // width/height: 16.16 fixed, after version/flags(4) +
                // times/ids (v0: 20, v1: 32) + reserved/layer/volume/
                // matrix (52)
                val wOff = b3 + (if (version == 1) 4 + 32 + 52 else 4 + 20 + 52)
                if (wOff + 8 <= e3) {
                  tw = beInt(bytes, wOff).toFloat / 65536f
                  th = beInt(bytes, wOff + 4).toFloat / 65536f
                }
              } else if (t3 == "mdia") {
                innerOk &= walkBoxes(bytes, b3, e3) { (t4, b4, e4) =>
                  if (t4 == "hdlr" && e4 - b4 >= 12)
                    handler = fourcc(bytes, b4 + 8)
                }
              }
            }
            if (handler == "vide") {
              nVideo += 1
              if (tw * th > width * height) { width = tw; height = th }
            } else if (handler == "soun") nAudio += 1
          }
        }
      }
    }
    if (!wellFormed || !innerOk || !sawMvhd || timescale <= 0) None
    else Some(Array(width, height, duration.toFloat / timescale,
      nTracks.toFloat, nVideo.toFloat, nAudio.toFloat, nTop.toFloat,
      timescale.toFloat))
  }

  // ---- FLAC (fLaC marker + STREAMINFO metadata block) ---------------------

  /** Walk the FLAC metadata-block chain from the `fLaC` marker (RFC 9639
    * §8): STREAMINFO (type 0, 34 bytes) MUST be the first block and
    * carries rate / channels / bits-per-sample / total samples. Features:
    * [sampleRate, channels, durationSec, bitsPerSample, nMetadataBlocks,
    * 0, 0, 0]. Refuses payloads without the marker, whose first block is
    * not a 34-byte STREAMINFO, whose block chain over-runs the payload,
    * or whose sample rate is 0 (forbidden for audio streams).
    */
  def decodeFlacHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 4 + 4 + 34) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    var off = 4
    var nBlocks = 0
    var info = Option.empty[Array[Float]]
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) return None
      val b0 = bytes(off) & 0xFF
      last = (b0 & 0x80) != 0
      val typ = b0 & 0x7F
      val len = ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
      val body = off + 4
      if (body + len > bytes.length) return None
      if (nBlocks == 0) {
        if (typ != 0 || len != 34) return None // STREAMINFO first, exactly
        // layout after the 10 block/frame-size bytes: 20-bit rate,
        // 3-bit channels-1, 5-bit bps-1, 36-bit total samples
        val b10 = bytes(body + 10) & 0xFF
        val b11 = bytes(body + 11) & 0xFF
        val b12 = bytes(body + 12) & 0xFF
        val b13 = bytes(body + 13) & 0xFF
        val rate = (b10 << 12) | (b11 << 4) | (b12 >> 4)
        val channels = ((b12 >> 1) & 0x7) + 1
        val bps = (((b12 & 0x1) << 4) | (b13 >> 4)) + 1
        val total = ((b13 & 0xFL) << 32) | ((bytes(body + 14) & 0xFFL) << 24) |
          ((bytes(body + 15) & 0xFFL) << 16) | ((bytes(body + 16) & 0xFFL) << 8) |
          (bytes(body + 17) & 0xFFL)
        if (rate == 0) return None
        info = Some(Array(rate.toFloat, channels.toFloat, total.toFloat / rate,
          bps.toFloat, 0f, 0f, 0f, 0f))
      }
      nBlocks += 1
      off = body + len
    }
    info.map { f => f(4) = nBlocks.toFloat; f }
  }

  // ---- WebM / Matroska (EBML) ---------------------------------------------

  private val EbmlId = 0x1A45DFA3L
  private val SegmentId = 0x18538067L

  /** EBML variable-length integer at `off`: (value, width). Element IDs
    * keep their length-marker bits (the spec's ID space includes them);
    * sizes clear them. None on a zero lead byte (reserved) or a vint
    * that over-runs the window.
    */
  private def vint(b: Array[Byte], off: Int, end: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (off >= end) return None
    val first = b(off) & 0xFF
    if (first == 0) return None
    val width = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (off + width > end) return None
    var v: Long = if (keepMarker) first else first & ((1 << (8 - width)) - 1)
    var i = 1
    while (i < width) { v = (v << 8) | (b(off + i) & 0xFF); i += 1 }
    Some((v, width))
  }

  /** Walk the direct EBML children of [start, end): `f(id, bodyStart,
    * bodyEnd)` per element. The unknown-size convention (all size bits 1
    * → element runs to the window's end) is accepted ONLY for Segment —
    * the one element real muxers stream with unknown size; anywhere else
    * it would swallow siblings like the BMFF size-0 case (boxAt).
    */
  private def ebmlChildren(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Boolean = {
    var off = start
    while (off < end) {
      val (id, idW) = vint(b, off, end, keepMarker = true).getOrElse(return false)
      val szOff = off + idW
      val (sz, szW) = vint(b, szOff, end, keepMarker = false).getOrElse(return false)
      val body = szOff + szW
      val unknown = sz == (1L << (7 * szW)) - 1
      if (unknown && id != SegmentId) return false
      val bodyEnd = if (unknown) end.toLong else body.toLong + sz
      if (bodyEnd > end || bodyEnd < body) return false
      f(id, body, bodyEnd.toInt)
      off = bodyEnd.toInt
    }
    true
  }

  private def ebmlUint(b: Array[Byte], start: Int, end: Int): Long = {
    var v = 0L
    var i = start
    while (i < end) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], start: Int, end: Int): Float =
    (end - start) match {
      case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, start, end).toInt)
      case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, start, end)).toFloat
      case _ => 0f
    }

  /** Walk a WebM/Matroska container: EBML header first (DocType must
    * read `webm` or `matroska`), then the Segment — duration ×
    * timecode-scale from Info, track type split and the largest video
    * track's pixel dimensions from Tracks. Features: [pixelWidth,
    * pixelHeight, durationSec, nTracks, nVideoTracks, nAudioTracks,
    * nTopLevelElements, timecodeScaleNs] (scale defaults to the spec's
    * 1,000,000 ns when absent). Refuses payloads not opening with the
    * EBML element, with a foreign DocType, with malformed vints or
    * element sizes that over-run, or without a Segment.
    */
  def decodeEbmlHeaders(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 8) return None
    // the container must OPEN with the EBML header element
    if (vint(bytes, 0, bytes.length, keepMarker = true).forall(_._1 != EbmlId))
      return None
    var docType = ""
    var sawSegment = false
    var timecodeScale = 1000000L
    var duration = 0f
    var nTracks = 0
    var nVideo = 0
    var nAudio = 0
    var nTop = 0
    var (width, height) = (0f, 0f)
    var innerOk = true // a malformed chain ANYWHERE refuses the payload
    val ok = ebmlChildren(bytes, 0, bytes.length) { (id, bs, be) =>
      nTop += 1
      if (id == EbmlId) {
        innerOk &= ebmlChildren(bytes, bs, be) { (id2, b2, e2) =>
          if (id2 == 0x4282L) // DocType
            docType = new String(bytes.slice(b2, e2), "ISO-8859-1")
        }
      } else if (id == SegmentId) {
        sawSegment = true
        innerOk &= ebmlChildren(bytes, bs, be) { (id2, b2, e2) =>
          if (id2 == 0x1549A966L) { // Info
            innerOk &= ebmlChildren(bytes, b2, e2) { (id3, b3, e3) =>
              if (id3 == 0x2AD7B1L) timecodeScale = ebmlUint(bytes, b3, e3)
              else if (id3 == 0x4489L) duration = ebmlFloat(bytes, b3, e3)
            }
          } else if (id2 == 0x1654AE6BL) { // Tracks
            innerOk &= ebmlChildren(bytes, b2, e2) { (id3, b3, e3) =>
              if (id3 == 0xAEL) { // TrackEntry
                nTracks += 1
                var typ = 0L
                var (tw, th) = (0f, 0f)
                innerOk &= ebmlChildren(bytes, b3, e3) { (id4, b4, e4) =>
                  if (id4 == 0x83L) typ = ebmlUint(bytes, b4, e4)
                  else if (id4 == 0xE0L) { // Video
                    innerOk &= ebmlChildren(bytes, b4, e4) { (id5, b5, e5) =>
                      if (id5 == 0xB0L) tw = ebmlUint(bytes, b5, e5).toFloat
                      else if (id5 == 0xBAL) th = ebmlUint(bytes, b5, e5).toFloat
                    }
                  }
                }
                if (typ == 1L) {
                  nVideo += 1
                  if (tw * th > width * height) { width = tw; height = th }
                } else if (typ == 2L) nAudio += 1
              }
            }
          }
        }
      }
    }
    if (!ok || !innerOk || !sawSegment || timecodeScale <= 0 ||
        (docType != "webm" && docType != "matroska")) None
    else Some(Array(width, height, duration * timecodeScale / 1e9f,
      nTracks.toFloat, nVideo.toFloat, nAudio.toFloat, nTop.toFloat,
      timecodeScale.toFloat))
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

  /** ISO-BMFF box codec: the mp4/quicktime video family plus the m4a
    * audio siblings (identical box structure; audio payloads simply
    * report zero dimensions and nVideoTracks=0). */
  object BmffHeaderCodec extends MediaOps.MediaCodec {
    val name = "bmff-headers"
    def claims(mime: String): Boolean =
      mime == "video/mp4" || mime == "video/quicktime" ||
        mime == "audio/mp4" || mime == "audio/x-m4a"
    def decode(bytes: Array[Byte]): Option[Array[Float]] =
      decodeBmffHeaders(bytes)
  }

  /** FLAC STREAMINFO codec (r17). */
  object FlacHeaderCodec extends MediaOps.MediaCodec {
    val name = "flac-headers"
    def claims(mime: String): Boolean =
      mime == "audio/flac" || mime == "audio/x-flac"
    def decode(bytes: Array[Byte]): Option[Array[Float]] =
      decodeFlacHeaders(bytes)
  }

  /** WebM/Matroska EBML codec (r17): the video family's open-container
    * sibling to the ISO-BMFF walk. */
  object EbmlHeaderCodec extends MediaOps.MediaCodec {
    val name = "ebml-headers"
    def claims(mime: String): Boolean =
      mime == "video/webm" || mime == "audio/webm" ||
        mime == "video/x-matroska" || mime == "audio/x-matroska"
    def decode(bytes: Array[Byte]): Option[Array[Float]] =
      decodeEbmlHeaders(bytes)
  }
}
