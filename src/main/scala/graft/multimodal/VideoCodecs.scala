package graft.multimodal

import java.io.ByteArrayInputStream

import graft.multimodal.MediaOps.MediaCodec

/** Video CONTENT codecs (r19 — the r17 carried item; before this, video
  * payloads stopped at the structural header walks in [[HeaderCodecs]]):
  * the two video families a stock JVM can genuinely decode without
  * external libraries get a bounded keyframe-luma sample — real pixel
  * statistics, not container arithmetic.
  *
  *   - **MJPEG** (concatenated JPEG frames, the classic IP-camera /
  *     AVI-MJPG payload): frame boundaries are the JPEG SOI markers,
  *     and each sampled frame decodes through the JVM's own ImageIO
  *     JPEG reader.
  *   - **YUV4MPEG2 / y4m** (raw uncompressed video, the reference
  *     interchange format of the ffmpeg/mjpegtools world): a plain-text
  *     header (`YUV4MPEG2 W.. H.. F..`) then `FRAME` records whose Y
  *     plane IS the luma — no codec needed at all.
  *
  * Both emit the same 8-float layout: [width, height, nFrames, fps,
  * lumaMean, lumaStd, motion, sampledFrames] — luma in [0,1],
  * `motion` = mean |Δ mean-luma| between consecutive SAMPLED frames (a
  * real content signal: a static camera reads ~0, a scene cut spikes),
  * fps 0 when the container doesn't state one (MJPEG). `nFrames`
  * SATURATES at [[FrameCap]]: the frame walk stops there (the bounded-
  * cost contract), so a reported value of exactly FrameCap means "at
  * least FrameCap frames" — consumers comparing frame counts treat it
  * as a floor, and the sampled keyframes then come from the walked
  * prefix. Every count below FrameCap is exact.
  *
  * Bounded by construction (the [[MediaOps.decodeImage]] discipline): at
  * most [[SampleFrames]] frames decode (first / middle / last — the
  * keyframe sample), each through a subsampled ≤32×32 pixel grid; the
  * frame COUNT pass is a single marker scan for MJPEG and header
  * arithmetic for y4m, so a pathological blob costs one byte scan plus
  * three thumbnail decodes, never a full-video decode.
  */
object VideoCodecs {

  val SampleFrames = 3
  private val Grid = 32

  /** Frame-walk bound: counting stops here, so `nFrames == FrameCap`
    * reads "at least FrameCap" (saturation, documented in the layout
    * scaladoc above) while anything below is exact. 100k frames is ~55
    * minutes at 30 fps — far past any training-clip payload — and keeps
    * a hostile header-only stream from turning the count pass into an
    * unbounded walk.
    */
  val FrameCap = 100000

  /** Indices of up to `k` sampled frames: first, middle, last. */
  private def sampleIdx(n: Int, k: Int = SampleFrames): Seq[Int] =
    if (n <= k) 0 until n
    else Seq(0, n / 2, n - 1).distinct

  /** Pooled (mean, std) of subsampled luma plus mean-luma per frame. */
  private final class LumaAgg {
    private var s = 0.0; private var s2 = 0.0; private var n = 0L
    private val frames = scala.collection.mutable.ArrayBuffer[Double]()
    def addFrame(lumas: Iterator[Double]): Unit = {
      var fs = 0.0; var fn = 0L
      lumas.foreach { l => s += l; s2 += l * l; n += 1; fs += l; fn += 1 }
      if (fn > 0) frames += fs / fn
    }
    def result(w: Int, h: Int, nFrames: Int, fps: Float): Option[Array[Float]] =
      if (n == 0) None
      else {
        val mean = s / n
        val std = math.sqrt(math.max(0.0, s2 / n - mean * mean))
        val motion =
          if (frames.length < 2) 0.0
          else frames.sliding(2).map(p => math.abs(p(1) - p(0))).sum /
            (frames.length - 1)
        Some(Array(w.toFloat, h.toFloat, nFrames.toFloat, fps,
          mean.toFloat, std.toFloat, motion.toFloat, frames.length.toFloat))
      }
  }

  /** MJPEG: concatenated JPEG frames, bounds found by a real SEGMENT
    * WALK per frame — not a raw FF D8 FF scan, which would count the
    * JPEG thumbnails EMBEDDED in EXIF APP1 payloads as frames and could
    * sample one as a "keyframe". The walk skips marker-segment payloads
    * wholesale (thumbnails live inside them) and ends a frame at the
    * first EOI after SOS (inside entropy data FF is escaped as FF 00 /
    * restart markers, so that EOI is the true frame end).
    */
  object MjpegCodec extends MediaCodec {
    val name = "mjpeg-luma"
    def claims(mime: String): Boolean = {
      val m = mime.toLowerCase
      m == "video/x-motion-jpeg" || m == "video/mjpeg" || m == "video/x-mjpeg"
    }

    /** End index (exclusive) of the JPEG frame starting at `start`, or
      * -1 when the structure is malformed/truncated. */
    private def frameEnd(bytes: Array[Byte], start: Int): Int = {
      var p = start + 2 // past SOI
      while (p + 1 < bytes.length) {
        if (bytes(p) != 0xFF.toByte) return -1
        val m = bytes(p + 1) & 0xFF
        if (m == 0xD9) return p + 2 // EOI (degenerate: no SOS)
        else if (m == 0xD8) return -1 // nested SOI outside a segment
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2 // standalone
        else if (m == 0xDA) { // SOS: entropy data until the true EOI
          if (p + 3 >= bytes.length) return -1
          var q = p + 2 + (((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF))
          while (q + 1 < bytes.length) {
            if (bytes(q) == 0xFF.toByte) {
              val e = bytes(q + 1) & 0xFF
              if (e == 0xD9) return q + 2
              else if (e == 0x00 || (e >= 0xD0 && e <= 0xD7)) q += 2
              else q += 1 // stray FF fill
            } else q += 1
          }
          return -1
        } else { // marker segment with 2-byte length (APPn/DQT/SOF/DHT…)
          if (p + 3 >= bytes.length) return -1
          val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
          if (len < 2) return -1
          p += 2 + len // skips EXIF payloads — embedded thumbnails too
        }
      }
      -1
    }

    def decode(bytes: Array[Byte]): Option[Array[Float]] = try {
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var i = 0
      while (i + 2 < bytes.length && frames.length < FrameCap) {
        if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
            bytes(i + 2) == 0xFF.toByte) {
          val end = frameEnd(bytes, i)
          if (end > 0) { frames += ((i, end)); i = end }
          else i = bytes.length // truncated tail frame: stop, keep walked
        } else i += 1 // tolerate padding between frames
      }
      if (frames.isEmpty) return None
      val agg = new LumaAgg
      var (w, h) = (0, 0)
      sampleIdx(frames.length).foreach { fi =>
        val (from, until) = frames(fi)
        val img = try {
          Option(javax.imageio.ImageIO.read(
            new ByteArrayInputStream(bytes, from, until - from)))
        } catch { case scala.util.control.NonFatal(_) => None }
        img.foreach { im =>
          if (w == 0) { w = im.getWidth; h = im.getHeight }
          val stepX = math.max(1, im.getWidth / Grid)
          val stepY = math.max(1, im.getHeight / Grid)
          agg.addFrame(for {
            y <- Iterator.range(0, im.getHeight, stepY)
            x <- Iterator.range(0, im.getWidth, stepX)
          } yield {
            val p = im.getRGB(x, y)
            (0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
              0.114 * (p & 0xFF)) / 255.0
          })
        }
      }
      // a frame walk alone is not content: if no sampled frame decoded,
      // refuse (→ header/stub tiers), never report zeros as pixels
      agg.result(w, h, frames.length, fps = 0f)
    } catch { // a hostile blob must land in the stub, never fail the task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** YUV4MPEG2: `YUV4MPEG2 W<w> H<h> F<num>:<den> [..] C<sub>\n` then
    * `FRAME[params]\n` + Y plane (w·h bytes) + chroma planes per C. */
  object Y4mCodec extends MediaCodec {
    val name = "y4m-luma"
    def claims(mime: String): Boolean = {
      val m = mime.toLowerCase
      m == "video/x-yuv4mpeg" || m == "video/y4m" || m == "application/x-yuv4mpeg"
    }
    def decode(bytes: Array[Byte]): Option[Array[Float]] = try {
      val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
      if (bytes.length < magic.length ||
        !bytes.take(magic.length).sameElements(magic)) return None
      val hEnd = bytes.indexOf('\n'.toByte)
      if (hEnd < 0) return None
      val header = new String(bytes, 0, hEnd, "US-ASCII")
      val params = header.split(' ').drop(1)
      // dims bounded to 16 bits each (a hostile 'W99999999999' refuses
      // instead of throwing in toInt) — but 16-bit × 16-bit still
      // overflows Int (65535² ≈ 4.3e9 wraps negative), so every frame-
      // size product below is computed in Long and guarded EXPLICITLY
      // against the blob length: refusal is by design, not by whatever
      // downstream exception the wrapped offset happens to hit (r19
      // advice)
      def intParam(p: Char): Option[Int] =
        params.collectFirst { case s if s.nonEmpty && s.head == p =>
          s.tail.takeWhile(_.isDigit) }
          .filter(d => d.nonEmpty && d.length <= 5).map(_.toInt)
          .filter(v => v > 0 && v <= 0xFFFF)
      val (w, h) = (intParam('W'), intParam('H')) match {
        case (Some(a), Some(b)) => (a, b)
        case _ => return None
      }
      val fps = params.collectFirst { case s if s.startsWith("F") =>
        s.tail.split(':') match {
          case Array(n, d) if n.forall(_.isDigit) && d.forall(_.isDigit) &&
            n.length <= 7 && d.length <= 7 && d.toFloat > 0 =>
            n.toFloat / d.toFloat
          case _ => 0f
        }
      }.getOrElse(0f)
      // a single Y plane larger than the whole blob cannot contain one
      // complete frame: refuse HERE, before any offset arithmetic —
      // this is also what keeps the Int casts below exact (yBytes ≤
      // bytes.length ≤ Int.MaxValue)
      val yBytes = w.toLong * h
      if (yBytes > bytes.length) return None
      // chroma plane bytes per frame — ceil'd per plane for odd dims
      // (C420 subsamples both axes: 2 planes of ⌈w/2⌉×⌈h/2⌉; a plain
      // w*h/2 misaligns every subsequent FRAME at odd w or h). Long:
      // 2·w·h at C444 can exceed Int even when w·h fits.
      val chromaBytes: Long = params.collectFirst {
        case s if s.startsWith("C") => s.tail
      }.getOrElse("420") match {
        case c if c.startsWith("420") => 2L * ((w + 1) / 2) * ((h + 1) / 2)
        case c if c.startsWith("422") => 2L * ((w + 1) / 2) * h
        case c if c.startsWith("444") => 2L * w * h
        case c if c.startsWith("mono") => 0L
        case _ => return None // an unknown layout would misalign every frame
      }
      // walk the FRAME records once (arithmetic, no pixel reads): the
      // frame count is exact (to FrameCap saturation) and the walk is
      // O(frames) header hops. The cursor advances in Long — one frame
      // stride can exceed Int — and stops cleanly past the blob end.
      val frameMagic = "FRAME".getBytes("US-ASCII")
      val yStarts = scala.collection.mutable.ArrayBuffer[Int]()
      var p: Long = hEnd + 1
      var ok = true
      while (ok && p < bytes.length && yStarts.length < FrameCap) {
        val pi = p.toInt // exact: 0 ≤ p < bytes.length ≤ Int.MaxValue
        if (pi + frameMagic.length <= bytes.length &&
            bytes.slice(pi, pi + frameMagic.length).sameElements(frameMagic)) {
          val nl = bytes.indexOf('\n'.toByte, pi)
          if (nl < 0) ok = false
          else {
            yStarts += nl + 1
            p = (nl + 1).toLong + yBytes + chromaBytes
          }
        } else ok = false
      }
      if (yStarts.isEmpty) return None
      val agg = new LumaAgg
      val stepX = math.max(1, w / Grid)
      val stepY = math.max(1, h / Grid)
      sampleIdx(yStarts.length).foreach { fi =>
        val y0 = yStarts(fi)
        if (y0 + yBytes <= bytes.length)
          agg.addFrame(for {
            y <- Iterator.range(0, h, stepY)
            x <- Iterator.range(0, w, stepX)
          } yield (bytes(y0 + y * w + x) & 0xFF) / 255.0)
      }
      agg.result(w, h, yStarts.length, fps)
    } catch { // a hostile blob must land in the stub, never fail the task
      case scala.util.control.NonFatal(_) => None
    }
  }
}
