package graft

import graft.multimodal.{AdpcmCodec, MediaOps}

/** IMA ADPCM WAV content decode (r20 — the compressed-audio tier): the
  * spec carries its own spec-conformant ENCODER (the public IMA
  * quantizer), so the planted payloads have analytic expectations — a
  * sine's rms/peak/zcr survive the 4-bit round-trip within ADPCM noise.
  * The stock JVM cannot read these at all (asserted), which is exactly
  * why the codec exists.
  */
class AdpcmCodecSpec extends SparkSpec {

  private val Steps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** The standard IMA quantizer: one nibble for (sample − predictor),
    * updating (predictor, index) exactly as the decoder will.
    */
  private final class ImaState {
    var predictor = 0
    var index = 0
    def encode(sample: Int): Int = {
      val step = Steps(index)
      var diff = sample - predictor
      var nibble = if (diff < 0) { diff = -diff; 8 } else 0
      if (diff >= step) { nibble |= 4; diff -= step }
      if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) { nibble |= 1 }
      // replay the decoder's reconstruction so encoder state tracks it
      var d = step >> 3
      if ((nibble & 1) != 0) d += step >> 2
      if ((nibble & 2) != 0) d += step >> 1
      if ((nibble & 4) != 0) d += step
      predictor = math.max(-32768,
        math.min(32767, if ((nibble & 8) != 0) predictor - d else predictor + d))
      index = math.max(0, math.min(88, index + IndexAdj(nibble & 7)))
      nibble
    }
  }

  /** Encode interleaved 16-bit samples as an IMA-ADPCM WAV blob
    * (format tag 0x0011, Microsoft block layout: 4-byte per-channel
    * headers whose predictor IS sample 0, then 4-byte-per-channel
    * nibble groups, low nibble first). `samples.length / ch` must fill
    * whole blocks so the planted stats stay analytic (no zero padding).
    */
  private def imaWav(samples: Array[Short], rate: Int, ch: Int,
      blockAlign: Int): Array[Byte] = {
    val spb = (blockAlign - 4 * ch) * 2 / ch + 1 // samples per block per ch
    val frames = samples.length / ch
    require(frames % spb == 0, s"fixture must fill whole blocks: $frames % $spb")
    val nBlocks = frames / spb
    val dataLen = nBlocks * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    out.write("RIFF".getBytes("US-ASCII")); w32(4 + 28 + 12 + 8 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x0011); w16(ch); w32(rate)
    w32(rate.toLong * blockAlign / spb) // avg bytes/sec (informational)
    w16(blockAlign); w16(4); w16(2); w16(spb)
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(frames)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    val st = Array.fill(ch)(new ImaState)
    var f = 0
    while (f < frames) {
      val block = new Array[Byte](blockAlign)
      var pos = 0
      for (c <- 0 until ch) {
        st(c).predictor = samples(f * ch + c)
        block(pos) = (st(c).predictor & 0xFF).toByte
        block(pos + 1) = ((st(c).predictor >> 8) & 0xFF).toByte
        block(pos + 2) = st(c).index.toByte
        block(pos + 3) = 0
        pos += 4
      }
      var s = 1 // sample 0 went into the header
      while (s < spb) {
        for (c <- 0 until ch) {
          var i = 0
          while (i < 8) {
            val nib = st(c).encode(samples((f + s + i) * ch + c))
            if (i % 2 == 0) block(pos) = nib.toByte
            else { block(pos) = (block(pos) | (nib << 4)).toByte; pos += 1 }
            i += 1
          }
        }
        s += 8
      }
      out.write(block)
      f += spb
    }
    out.toByteArray
  }

  private def sine(frames: Int, rate: Double, amp: Int): Array[Short] =
    Array.tabulate(frames)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * amp).toInt.toShort)

  test("mono ADPCM: full PCM reconstruction reads the sine's analytic rms/peak/zcr; stock JavaSound cannot read it at all") {
    // blockAlign 256 → 505 samples/block; 8 blocks = 4040 frames
    val frames = 505 * 8
    val wav = imaWav(sine(frames, 8000, 30000), 8000, ch = 1, blockAlign = 256)
    assert(MediaOps.decodeAudio(wav).isEmpty,
      "stock javax.sound.sampled must NOT claim IMA ADPCM — if it ever " +
        "does, this codec should yield to it in the route")
    val f = AdpcmCodec.decode(wav).get
    assert(f(0) == 8000f && f(1) == 1f, s"rate/channels: ${f.mkString(",")}")
    assert(math.abs(f(2) - frames / 8000f) < 1e-4, s"duration: ${f(2)}")
    // amp 30000/32768 sine: rms = amp/√2 ≈ 0.6473, peak ≈ 0.9155 —
    // 4-bit ADPCM tracks a 440 Hz tone closely; ±0.02 absorbs its noise
    assert(math.abs(f(3) - 0.6473f) < 0.02, s"rms: ${f(3)}")
    // the quantizer can OVERSHOOT a crest by up to a step (its noise is
    // one-sided there), so peak reads the true 0.9155 or a little above
    assert(f(4) > 0.89f && f(4) < 0.97f, s"peak: ${f(4)}")
    assert(math.abs(f(5) - 0.11f) < 0.01, s"zcr: ${f(5)}")
  }

  test("stereo ADPCM: out-of-phase channels keep the per-channel zcr (the interleave trap)") {
    val frames = 249 * 8 // blockAlign 256 stereo → 249 samples/block
    val mono = sine(frames, 8000, 30000)
    val inter = new Array[Short](frames * 2)
    var i = 0
    while (i < frames) {
      inter(2 * i) = mono(i); inter(2 * i + 1) = (-mono(i)).toShort; i += 1
    }
    val f = AdpcmCodec.decode(
      imaWav(inter, 8000, ch = 2, blockAlign = 256)).get
    assert(f(1) == 2f, s"channels: ${f(1)}")
    assert(math.abs(f(2) - frames / 8000f) < 1e-4, s"duration: ${f(2)}")
    assert(math.abs(f(5) - 0.11f) < 0.01,
      s"stereo zcr must match the underlying tone, got ${f(5)}")
  }

  test("registry route: ADPCM lands on ima-adpcm, PCM stays on javasound, garbage quarantines to the stub") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    val adpcm = imaWav(sine(505 * 2, 8000, 25000), 8000, 1, 256)
    // a PCM WAV alongside: JavaSound must keep winning that route
    val pcmBytes = new Array[Byte](1000 * 2)
    var i = 0
    while (i < 1000) {
      val s = (math.sin(2 * math.Pi * 440 * i / 8000) * 25000).toInt.toShort
      pcmBytes(2 * i) = (s & 0xFF).toByte
      pcmBytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcmBytes), fmt, 1000L),
      AudioFileFormat.Type.WAVE, baos)
    val media = Seq(
      (1L, adpcm, "audio/wav", adpcm.length.toLong),
      (2L, baos.toByteArray, "audio/wav", baos.size().toLong),
      (3L, "not audio at all".getBytes("UTF-8"), "audio/wav", 16L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).decoded && out(1L).codec == "ima-adpcm", s"${out(1L)}")
    assert(out(2L).decoded && out(2L).codec == "javasound", s"${out(2L)}")
    assert(!out(3L).decoded, "unclaimed bytes must quarantine to the stub")
  }

  test("hostile blobs refuse by design: truncation mid-block keeps walked prefix stats, non-IMA tags and torn headers yield None") {
    val wav = imaWav(sine(505 * 4, 8000, 20000), 8000, 1, 256)
    // truncated mid-block: the walked prefix still reads as content
    val cut = AdpcmCodec.decode(wav.take(wav.length - 100))
    assert(cut.isDefined && math.abs(cut.get(3) - 0.43f) < 0.1,
      s"truncation must keep the decodable prefix: $cut")
    // a PCM fmt tag under this codec refuses (JavaSound's job)
    val pcmTagged = wav.clone()
    pcmTagged(20) = 1; pcmTagged(21) = 0
    assert(AdpcmCodec.decode(pcmTagged).isEmpty)
    // torn header
    assert(AdpcmCodec.decode(wav.take(30)).isEmpty)
    assert(AdpcmCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }
}
