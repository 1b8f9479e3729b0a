package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{HeaderCodecs, MediaOps}
import graft.sources.Tables

class MediaOpsSpec extends SparkSpec {

  test("attachBlobs preserves byte length and schema") {
    val m = MediaOps.attachBlobs(Tables.documents(spark, sfDir))
    val r = m.select(col("n_bytes"), length(col("blob")).cast("long").as("bl")).collect()
    assert(r.nonEmpty && r.forall(x => x.getLong(0) == x.getLong(1)))
    assert(m.schema("blob").dataType.typeName == "binary")
  }

  test("frameSample emits fixed-width frames with the right stride") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val frames = MediaOps.frameSample(MediaOps.attachBlobs(docs), everyK = 2).collect()
    // 1000 bytes → 4 frames (256-wide); every 2nd → idx 0, 2
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 2)))
    val f0 = frames.find(_.getAs[Int]("frame_idx") == 0).get.getAs[Array[Byte]]("frame")
    assert(f0.length == MediaOps.FrameBytes)
  }

  test("image payloads decode for real through ImageIO; unclaimed bytes fall back") {
    import spark.implicits._
    // 4x2 PNG: left half pure red, right half pure blue
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xFF0000 else 0x0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val media = Seq(
      (1L, png, "image/png", png.length.toLong),
      (2L, "not an image at all".getBytes("UTF-8"), "image/png", 19L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val feats = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.features).toMap

    val real = feats(1L)
    assert(real(0) == 4f && real(1) == 2f, s"decoded dimensions: ${real.mkString(",")}")
    assert(real(2) == 127.5f && real(3) == 0f && real(4) == 127.5f,
      s"decoded channel means: ${real.mkString(",")}")
    assert(real(5) == 2f, "aspect ratio from decoded pixels")
    // bytes no reader claims take the stub path, bit-for-bit
    assert(feats(2L).sameElements(MediaOps.decodeStub("not an image at all".getBytes("UTF-8"))))
  }

  test("resize decodes, scales, and re-encodes real images; stub rows are flagged") {
    import spark.implicits._
    // 8x4 PNG, left half red / right half blue - downscale to 4x2
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xFF0000 else 0x0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val media = Seq(
      (1L, png, "image/png", png.length.toLong),
      (2L, "definitely not pixels".getBytes("UTF-8"), "video/mp4", 21L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.resizeBlobs(spark, media, width = 4, height = 2)
      .collect().map(r => r.doc_id -> r).toMap

    // the real image: round-trips through the decoder at the new dims,
    // and the scaled pixels keep the halves' colors
    val real = out(1L)
    assert(real.decoded && real.mime == "image/png")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(real.blob))
    assert(back.getWidth == 4 && back.getHeight == 2)
    assert((back.getRGB(0, 0) & 0xFF0000) != 0, "left stays red")
    assert((back.getRGB(3, 1) & 0x0000FF) != 0, "right stays blue")

    // the undecodable row: deterministic fixed-budget stub, flagged
    val stub = out(2L)
    assert(!stub.decoded && stub.mime == "video/mp4")
    assert(stub.blob.length == 4 * 2 * 3)
    assert(stub.blob.sameElements(
      MediaOps.resizeStub("definitely not pixels".getBytes("UTF-8"), 4, 2)))
  }

  test("audio payloads decode for real through javax.sound.sampled; unclaimed bytes fall back") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    // planted WAV: 0.5 s of a full-scale 440 Hz sine at 8 kHz mono 16-bit
    val rate = 8000f
    val nSamples = 4000
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val media = Seq(
      (1L, wav, "audio/wav", wav.length.toLong),
      (2L, "definitely not audio".getBytes("UTF-8"), "audio/wav", 20L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val feats = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.features).toMap

    val real = feats(1L)
    assert(real(0) == 8000f && real(1) == 1f, s"rate/channels: ${real.mkString(",")}")
    assert(math.abs(real(2) - 0.5f) < 1e-3, s"duration: ${real(2)}")
    // a full-scale sine has rms 1/sqrt(2) and peak ~1.0; 440 Hz at 8 kHz
    // crosses zero ~2*440 times/s = rate/9.09 -> zcr ~0.11
    assert(math.abs(real(3) - 0.7071f) < 0.01, s"rms: ${real(3)}")
    assert(real(4) > 0.99f && real(4) <= 1.0f, s"peak: ${real(4)}")
    assert(math.abs(real(5) - 0.11f) < 0.01, s"zero-cross rate: ${real(5)}")
    // bytes no audio reader claims take the stub path, bit-for-bit
    assert(feats(2L).sameElements(MediaOps.decodeStub("definitely not audio".getBytes("UTF-8"))))
  }

  test("stereo zcr counts per-channel sign flips, not interleaved channel differences") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // OUT-OF-PHASE stereo: R = -L at every frame. Interleaved adjacent
    // samples then flip sign on nearly every comparison (zcr -> 1.0);
    // the true per-channel zcr is the mono sine's ~0.11.
    val rate = 8000f
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 4)
    var i = 0
    while (i < nFrames) {
      val l = (math.sin(2 * math.Pi * 440 * i / rate) * 30000).toInt.toShort
      val r = (-l).toShort
      pcm(4 * i) = (l & 0xFF).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xFF).toByte
      pcm(4 * i + 2) = (r & 0xFF).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 2, 4, rate, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val feats = MediaOps.decodeAudio(baos.toByteArray).get
    assert(feats(1) == 2f, s"channels: ${feats(1)}")
    assert(math.abs(feats(5) - 0.11f) < 0.01,
      s"stereo zcr must match the underlying tone, got ${feats(5)}")
  }

  test("decode stub is deterministic, fixed-dim, and distributed via mapPartitions") {
    val media = MediaOps.attachBlobs(Tables.documents(spark, sfDir))
    val f1 = MediaOps.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = MediaOps.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == MediaOps.FeatureDim))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // stub rows are flagged — a quarantine can route on `decoded` alone
    assert(f1.forall(f => !f.decoded && f.codec == "stub"))
  }

  test("codec registry: a registered decoder routes its mime; refusals fall through to the flagged stub") {
    import spark.implicits._
    try {
      MediaOps.registerCodec(new FakeMp3Codec)
      val media = Seq(
        (1L, "mp3ish-bytes".getBytes("UTF-8"), "audio/mpeg", 12L),
        // claimed by BOTH the fake codec and the javasound builtin, but
        // both refuse the empty payload — must land in the stub, flagged
        (2L, Array.empty[Byte], "audio/mpeg", 0L),
        (3L, "plain".getBytes("UTF-8"), "video/mp4", 5L) // nothing claims
      ).toDF("doc_id", "blob", "mime", "n_bytes")
      val out = MediaOps.extractFeatures(spark, media).collect()
        .map(f => f.doc_id -> f).toMap
      assert(out(1L).decoded && out(1L).codec == "fake-mp3",
        s"registered codec must take its mime: ${out(1L)}")
      assert(out(1L).features(7) == 12f)
      assert(!out(2L).decoded && out(2L).codec == "stub",
        "a refusing codec chain must end at the flagged stub")
      assert(!out(3L).decoded && out(3L).codec == "stub")
      // the builtins are untouched by registration: images still decode
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      val png = baos.toByteArray
      val imf = MediaOps.extractFeatures(spark,
        Seq((9L, png, "image/png", png.length.toLong))
          .toDF("doc_id", "blob", "mime", "n_bytes")).collect()(0)
      assert(imf.decoded && imf.codec == "imageio")
    } finally MediaOps.resetCodecs()
    assert(MediaOps.registeredCodecs.map(_.name) ==
      Seq("imageio", "javasound", "ima-adpcm", "mjpeg-luma", "y4m-luma",
        "mpeg-headers", "ogg-headers", "bmff-headers", "flac-headers",
        "ebml-headers"))
  }

  /** A valid MPEG-1 Layer III 128 kbps 44100 Hz joint-stereo frame chain
    * built from the public header layout: 0xFF 0xFB 0x90 0x40, frame
    * length 144·128000/44100 = 417 bytes. */
  private def plantedMp3(nFrames: Int, id3: Boolean = false): Array[Byte] = {
    val frame = new Array[Byte](417)
    frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
    frame(2) = 0x90.toByte; frame(3) = 0x40.toByte
    java.util.Arrays.fill(frame, 4, 417, 0xAA.toByte)
    val tag =
      if (!id3) Array.empty[Byte]
      else Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++
        new Array[Byte](12) // syncsafe size 12
    tag ++ Array.fill(nFrames)(frame).flatten
  }

  /** A minimal 2-page Ogg/Vorbis stream: BOS page carrying the Vorbis
    * identification header (44100 Hz, 2ch, 128 kbps nominal), EOS page
    * with granule 44100 (= 1.0 s of PCM). CRCs are zero — the header
    * walk reads structure, not checksums. */
  private def plantedOgg(): Array[Byte] = {
    def page(htype: Int, granule: Long, body: Array[Byte]): Array[Byte] = {
      val h = new Array[Byte](27 + 1)
      h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'; h(4) = 0
      h(5) = htype.toByte
      var i = 0
      while (i < 8) { h(6 + i) = ((granule >> (8 * i)) & 0xFF).toByte; i += 1 }
      h(26) = 1; h(27) = body.length.toByte
      h ++ body
    }
    val id = new Array[Byte](30)
    id(0) = 1; "vorbis".getBytes("US-ASCII").copyToArray(id, 1)
    id(11) = 2 // channels
    val rate = 44100; val nom = 128000
    var i = 0
    while (i < 4) {
      id(12 + i) = ((rate >> (8 * i)) & 0xFF).toByte
      id(20 + i) = ((nom >> (8 * i)) & 0xFF).toByte
      i += 1
    }
    page(0x02, 0L, id) ++ page(0x04, 44100L, Array.fill(10)(0x55.toByte))
  }

  test("mpeg-headers codec: real frame-header walk — rate/channels/duration/bitrate from the framing") {
    val f = HeaderCodecs.decodeMpegHeaders(plantedMp3(3)).get
    assert(f(0) == 44100f && f(1) == 2f, s"rate/channels: ${f.toSeq}")
    assert(math.abs(f(2) - 3 * 1152f / 44100) < 1e-6, s"duration: ${f(2)}")
    assert(f(3) == 128f && f(4) == 3f && f(5) == 0f, s"cbr 3 frames: ${f.toSeq}")
    // ID3v2 prefix skipped, same structure found
    val g = HeaderCodecs.decodeMpegHeaders(plantedMp3(2, id3 = true)).get
    assert(g(4) == 2f, s"id3-prefixed chain: ${g.toSeq}")
    // a lone false sync in arbitrary bytes is refused (chained-pair screen)
    val noise = Array[Byte](0x41, 0xFF.toByte, 0xFB.toByte, 0x90.toByte,
      0x40, 0x41, 0x42, 0x43)
    assert(HeaderCodecs.decodeMpegHeaders(noise).isEmpty)
    assert(HeaderCodecs.decodeMpegHeaders("words".getBytes("UTF-8")).isEmpty)
  }

  /** plantedMp3 with explicit global_gain fields: the four per-frame
    * (granule, channel) 8-bit gains of the MPEG-1 joint-stereo frame sit
    * at side-info bit offsets 41/100/159/218 (start 9+3+8=20, 59-bit
    * blocks, +21 within each) -- written with the mirror of the
    * decoder's bit arithmetic so expectations stay analytic. */
  private def plantedMp3Gains(gainsPerFrame: Seq[Int]): Array[Byte] = {
    def put8(frame: Array[Byte], bitOff: Int, v: Int): Unit = {
      val byteOff = 4 + (bitOff >> 3); val sh = bitOff & 7
      val w = ((frame(byteOff) & 0xFF) << 8) | (frame(byteOff + 1) & 0xFF)
      val mask = 0xFF00 >> sh
      val nw = (w & ~mask) | ((v & 0xFF) << (8 - sh))
      frame(byteOff) = ((nw >> 8) & 0xFF).toByte
      frame(byteOff + 1) = (nw & 0xFF).toByte
    }
    gainsPerFrame.toArray.flatMap { g =>
      val frame = new Array[Byte](417)
      frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
      frame(2) = 0x90.toByte; frame(3) = 0x40.toByte
      java.util.Arrays.fill(frame, 4, 417, 0xAA.toByte)
      Seq(41, 100, 159, 218).foreach(off => put8(frame, off, g))
      frame
    }
  }

  test("mpeg-headers energy proxy (r20): planted global_gain reads exact mean/std; constant gain reads std 0") {
    val flat = HeaderCodecs.decodeMpegHeaders(plantedMp3Gains(Seq(200, 200, 200))).get
    assert(math.abs(flat(6) - 200 / 255f) < 1e-6, s"gain mean: ${flat(6)}")
    assert(flat(7) == 0f, s"constant gain must read std 0: ${flat(7)}")
    val gains = Seq(100, 200, 100)
    val dyn = HeaderCodecs.decodeMpegHeaders(plantedMp3Gains(gains)).get
    val mean = gains.map(_.toDouble).sum / gains.size
    val std = math.sqrt(gains.map(g => g * g.toDouble).sum / gains.size - mean * mean)
    assert(math.abs(dyn(6) - mean / 255) < 1e-6, s"gain mean: ${dyn(6)}")
    assert(math.abs(dyn(7) - std / 255) < 1e-6, s"gain std: ${dyn(7)}")
    // the structural features are untouched by the gain read
    assert(dyn(0) == 44100f && dyn(1) == 2f && dyn(4) == 3f)
  }

  test("ogg-headers codec: page walk + Vorbis id header — duration from the final granule") {
    val f = HeaderCodecs.decodeOggHeaders(plantedOgg()).get
    assert(f(0) == 44100f && f(1) == 2f, s"rate/channels: ${f.toSeq}")
    assert(f(2) == 1.0f, s"granule 44100 at 44100 Hz = 1 s: ${f(2)}")
    assert(f(3) == 128f && f(4) == 2f, s"nominal kbps / pages: ${f.toSeq}")
    assert(HeaderCodecs.decodeOggHeaders("OggX nope".getBytes("UTF-8")).isEmpty)
    // an Ogg page whose first packet is not a Vorbis id header is refused
    // (e.g. Theora video in an Ogg container must not fake audio features)
    val notVorbis = plantedOgg()
    notVorbis(28) = 0x7F // corrupt the packet-type byte
    assert(HeaderCodecs.decodeOggHeaders(notVorbis).isEmpty)
  }

  /** The spec-shaped ISO-BMFF payload — built by the shared
    * [[BmffFixture]] (one box grammar for every spec that feeds the
    * walker). Box sizes tile their parents exactly, as the walker
    * requires. */
  private def plantedMp4(): Array[Byte] = BmffFixture.plantedMp4()

  test("bmff-headers codec: box walk — dims/duration/track split from the container") {
    val f = HeaderCodecs.decodeBmffHeaders(plantedMp4()).get
    assert(f(0) == 640f && f(1) == 360f, s"video dims: ${f.toSeq}")
    assert(f(2) == 2.0f, s"duration 1200/600 = 2 s: ${f(2)}")
    assert(f(3) == 2f && f(4) == 1f && f(5) == 1f,
      s"2 tracks = 1 video + 1 audio: ${f.toSeq}")
    assert(f(6) == 2f && f(7) == 600f, s"top boxes / timescale: ${f.toSeq}")
    // refusals: no leading ftyp; truncated box chain (size over-runs);
    // arbitrary bytes
    assert(HeaderCodecs.decodeBmffHeaders(plantedMp4().drop(16)).isEmpty,
      "moov without a leading ftyp must refuse")
    assert(HeaderCodecs.decodeBmffHeaders(plantedMp4().dropRight(5)).isEmpty,
      "a box size that over-runs the payload must refuse")
    assert(HeaderCodecs.decodeBmffHeaders("not a container".getBytes("UTF-8")).isEmpty)
    // an ftyp-only payload (no mvhd) is structure without a movie — refused
    assert(HeaderCodecs.decodeBmffHeaders(plantedMp4().take(16)).isEmpty)
    // regression (r16 review): a structurally valid chain with an
    // EMPTY-body tkhd must skip the absent fields, not read past the box
    val et = HeaderCodecs.decodeBmffHeaders(BmffFixture.emptyTkhdMp4()).get
    assert(et(2) == 2.0f && et(3) == 1f && et(4) == 1f && et(0) == 0f,
      s"empty tkhd: track counted via hdlr, no dims, no throw: ${et.toSeq}")
  }

  test("mp3/ogg/mp4 route through the registry as decoded structural features; undecodable bytes stay stubbed") {
    import spark.implicits._
    val mp3 = plantedMp3(3); val ogg = plantedOgg(); val mp4 = plantedMp4()
    val media = Seq(
      (1L, mp3, "audio/mpeg", mp3.length.toLong),
      (2L, ogg, "audio/ogg", ogg.length.toLong),
      // video mime but non-BMFF bytes: claimed by bmff-headers, refused
      // by the box walk -> flagged stub, never a fake
      (3L, "not media".getBytes("UTF-8"), "video/mp4", 9L),
      // mp3 mime but undecodable bytes: refused by javasound AND the
      // header parser -> flagged stub, never a fake
      (4L, "zz".getBytes("UTF-8"), "audio/mpeg", 2L),
      (5L, mp4, "video/mp4", mp4.length.toLong)
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).decoded && out(1L).codec == "mpeg-headers", s"${out(1L)}")
    assert(out(1L).features(0) == 44100f && out(1L).features(4) == 3f)
    assert(out(2L).decoded && out(2L).codec == "ogg-headers", s"${out(2L)}")
    assert(out(2L).features(2) == 1.0f)
    assert(!out(3L).decoded && out(3L).codec == "stub")
    assert(!out(4L).decoded && out(4L).codec == "stub")
    assert(out(5L).decoded && out(5L).codec == "bmff-headers", s"${out(5L)}")
    assert(out(5L).features(0) == 640f && out(5L).features(2) == 2.0f)
  }

  /** A deterministic 64×64 gradient PNG; `tweak` nudges a few pixels so
    * re-encodes of "the same picture" land within a small aHash
    * distance while a different picture lands far away. */
  private def gradientPng(tweak: Boolean = false, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if (invert) 255 - (x * 4 min 255) else x * 4 min 255
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (tweak) for (y <- 0 until 3; x <- 0 until 3)
      img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("perceptualHash: stable under small edits, far for a different picture, None for non-images") {
    val base = MediaOps.perceptualHash(gradientPng())
    val near = MediaOps.perceptualHash(gradientPng(tweak = true))
    val far = MediaOps.perceptualHash(gradientPng(invert = true))
    assert(base.isDefined && near.isDefined && far.isDefined)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base.get, near.get) <= 4,
      s"nudged copy must stay close, got ${ham(base.get, near.get)}")
    assert(ham(base.get, far.get) > 16,
      s"inverted picture must read far, got ${ham(base.get, far.get)}")
    assert(MediaOps.perceptualHash("not pixels".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDup: re-encoded twin pairs, different picture and undecodables never pair") {
    import spark.implicits._
    val media = Seq(
      (1L, gradientPng(), "image/png", 0L),
      (2L, gradientPng(tweak = true), "image/png", 0L),
      (3L, gradientPng(invert = true), "image/png", 0L),
      (4L, "definitely not pixels".getBytes("UTF-8"), "video/mp4", 0L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val pairs = MediaOps.imageNearDup(media, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"only the perceptual twin may pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 8)
    // partitioning-independent (the pair set is a function of content)
    val rep = MediaOps.imageNearDup(media.repartition(5), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep == Set((1L, 2L)))
    intercept[IllegalArgumentException](MediaOps.imageNearDup(media, 64))
  }

  test("imageNearDup banding is pigeonhole-complete: every <=t pair survives the chunk join") {
    import spark.implicits._
    // adversarial placement: flip t bits CONCENTRATED at chunk
    // boundaries of a synthetic hash pair — the pair must still emit.
    // Build two fake 1×1-pixel... instead drive the DataFrame directly
    // through the chunk join by planting blobs whose hashes we control
    // is impossible (hash comes from pixels), so assert the guarantee
    // arithmetically over the chunk layout: 9 chunks cover all 64 bits
    // with no gaps or overlaps, so 8 flips cannot touch all 9.
    val bands = 9
    val bounds = (0 until bands).map(i => (i * 64 / bands, (i + 1) * 64 / bands))
    assert(bounds.head._1 == 0 && bounds.last._2 == 64)
    assert(bounds.sliding(2).forall { case Seq((_, hi), (lo, _)) => hi == lo })
    assert(bounds.forall { case (lo, hi) => hi > lo })
  }

  /** fLaC marker + STREAMINFO (44100 Hz stereo 16-bit, 88200 samples =
    * 2.0 s, NOT last) + a 4-byte PADDING block (last). */
  private def plantedFlac(): Array[Byte] = {
    val info = new Array[Byte](34)
    info(0) = 0x10; info(1) = 0x00 // min block 4096
    info(2) = 0x10; info(3) = 0x00 // max block 4096
    // bytes 4..9: min/max frame size 0
    val rate = 44100; val total = 88200L
    info(10) = (rate >> 12).toByte
    info(11) = ((rate >> 4) & 0xFF).toByte
    info(12) = (((rate & 0xF) << 4) | ((2 - 1) << 1) | ((16 - 1) >> 4)).toByte
    info(13) = ((((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)).toByte
    info(14) = ((total >> 24) & 0xFF).toByte
    info(15) = ((total >> 16) & 0xFF).toByte
    info(16) = ((total >> 8) & 0xFF).toByte
    info(17) = (total & 0xFF).toByte
    "fLaC".getBytes("ISO-8859-1") ++
      Array[Byte](0x00, 0x00, 0x00, 34) ++ info ++          // STREAMINFO
      Array[Byte](0x81.toByte, 0x00, 0x00, 0x04, 0, 0, 0, 0) // PADDING, last
  }

  /** Minimal WebM: EBML header (DocType "webm") + Segment(Info(scale
    * 1e6 ns, duration 2000 ticks = 2.0 s) + Tracks(video 640x360,
    * audio)). */
  private def plantedWebm(docType: String = "webm"): Array[Byte] = {
    def el(id: Seq[Int], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id.map(_.toByte).toArray ++ Array((0x80 | body.length).toByte) ++ body
    }
    def uint(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray
    val ebml = el(Seq(0x1A, 0x45, 0xDF, 0xA3),
      el(Seq(0x42, 0x82), docType.getBytes("ISO-8859-1")))
    val infoEl = el(Seq(0x15, 0x49, 0xA9, 0x66),
      el(Seq(0x2A, 0xD7, 0xB1), uint(1000000L, 3)) ++
        el(Seq(0x44, 0x89), uint(java.lang.Float.floatToIntBits(2000f) & 0xFFFFFFFFL, 4)))
    val video = el(Seq(0xAE),
      el(Seq(0x83), uint(1L, 1)) ++
        el(Seq(0xE0), el(Seq(0xB0), uint(640L, 2)) ++ el(Seq(0xBA), uint(360L, 2))))
    val audio = el(Seq(0xAE), el(Seq(0x83), uint(2L, 1)))
    val tracks = el(Seq(0x16, 0x54, 0xAE, 0x6B), video ++ audio)
    ebml ++ el(Seq(0x18, 0x53, 0x80, 0x67), infoEl ++ tracks)
  }

  test("flac-headers codec: STREAMINFO walk — rate/channels/duration/bps from the block chain") {
    val f = HeaderCodecs.decodeFlacHeaders(plantedFlac()).get
    assert(f(0) == 44100f && f(1) == 2f, s"rate/channels: ${f.toSeq}")
    assert(f(2) == 2.0f && f(3) == 16f, s"duration/bps: ${f.toSeq}")
    assert(f(4) == 2f, s"2 metadata blocks walked: ${f.toSeq}")
    // refusals: no marker; truncated chain; first block not STREAMINFO;
    // arbitrary bytes
    assert(HeaderCodecs.decodeFlacHeaders(plantedFlac().drop(4)).isEmpty)
    assert(HeaderCodecs.decodeFlacHeaders(plantedFlac().dropRight(3)).isEmpty)
    val wrongFirst = plantedFlac()
    wrongFirst(4) = 0x01 // PADDING where STREAMINFO must sit
    assert(HeaderCodecs.decodeFlacHeaders(wrongFirst).isEmpty)
    assert(HeaderCodecs.decodeFlacHeaders("not audio data".getBytes("UTF-8")).isEmpty)
  }

  test("ebml-headers codec: WebM walk — dims/duration/track split; foreign DocType refused") {
    val f = HeaderCodecs.decodeEbmlHeaders(plantedWebm()).get
    assert(f(0) == 640f && f(1) == 360f, s"video dims: ${f.toSeq}")
    assert(f(2) == 2.0f, s"2000 ticks x 1e6 ns = 2 s: ${f(2)}")
    assert(f(3) == 2f && f(4) == 1f && f(5) == 1f,
      s"2 tracks = 1 video + 1 audio: ${f.toSeq}")
    assert(f(6) == 2f && f(7) == 1000000f, s"top elements / scale: ${f.toSeq}")
    assert(HeaderCodecs.decodeEbmlHeaders(plantedWebm("foo")).isEmpty,
      "a non-webm/matroska DocType must refuse")
    assert(HeaderCodecs.decodeEbmlHeaders(plantedWebm("matroska")).nonEmpty)
    assert(HeaderCodecs.decodeEbmlHeaders(plantedWebm().dropRight(2)).isEmpty,
      "an element size over-running the payload must refuse")
    assert(HeaderCodecs.decodeEbmlHeaders("zz not a container".getBytes("UTF-8")).isEmpty)
  }

  test("flac/webm route through the registry as decoded structural features") {
    import spark.implicits._
    val flac = plantedFlac(); val webm = plantedWebm()
    val media = Seq(
      (1L, flac, "audio/flac", flac.length.toLong),
      (2L, webm, "video/webm", webm.length.toLong),
      // claimed mimes with undecodable bytes: flagged stubs, never fakes
      (3L, "zz".getBytes("UTF-8"), "audio/flac", 2L),
      (4L, "zz".getBytes("UTF-8"), "video/webm", 2L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).decoded && out(1L).codec == "flac-headers", s"${out(1L)}")
    assert(out(1L).features(0) == 44100f && out(1L).features(2) == 2.0f)
    assert(out(2L).decoded && out(2L).codec == "ebml-headers", s"${out(2L)}")
    assert(out(2L).features(0) == 640f && out(2L).features(5) == 1f)
    assert(!out(3L).decoded && !out(4L).decoded,
      "undecodable bytes under claimed mimes must stay flagged stubs")
  }

  test("y4m video content stats: planted frames read exact luma mean/std/motion, malformed falls to stub") {
    import spark.implicits._
    // 4x2 C420 at 25 fps, three planted frames: all-0, all-255, all-128
    // luma — every pixel lands in the <=32x32 grid at this size, so the
    // statistics are EXACT, not sampled
    def frame(y: Int): Array[Byte] =
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(4 * 2)(y.toByte) ++
        Array.fill(4 * 2 / 2)(0x80.toByte) // U+V for C420
    val y4m = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII") ++
      frame(0) ++ frame(255) ++ frame(128)
    val media = Seq(
      (1L, y4m, "video/x-yuv4mpeg", y4m.length.toLong),
      (2L, "YUV4MPEG2 W0 H2\njunk".getBytes("US-ASCII"), "video/x-yuv4mpeg", 20L),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    val f = out(1L)
    assert(f.decoded && f.codec == "y4m-luma", s"${f.codec}/${f.decoded}")
    val v = f.features
    assert(v(0) == 4f && v(1) == 2f && v(2) == 3f, s"w/h/frames: ${v.mkString(",")}")
    assert(math.abs(v(3) - 25f) < 1e-6, s"fps: ${v(3)}")
    val lumas = Seq(0.0, 1.0, 128 / 255.0)
    val mean = lumas.sum / 3
    val std = math.sqrt(lumas.map(l => (l - mean) * (l - mean)).sum / 3)
    assert(math.abs(v(4) - mean) < 1e-6, s"lumaMean: ${v(4)} vs $mean")
    assert(math.abs(v(5) - std) < 1e-6, s"lumaStd: ${v(5)} vs $std")
    val motion = (math.abs(1.0 - 0.0) + math.abs(128 / 255.0 - 1.0)) / 2
    assert(math.abs(v(6) - motion) < 1e-6, s"motion: ${v(6)} vs $motion")
    assert(v(7) == 3f, "all three frames sampled at n <= SampleFrames")
    // malformed header: refused by the codec, lands in the flagged stub
    assert(!out(2L).decoded, "a malformed y4m must never report pixels")
  }

  test("y4m hardening: W*H overflow refuses instead of throwing; odd dims keep chroma alignment") {
    import spark.implicits._
    // 46341^2 overflows Int — pre-fix this wrapped negative, slipped the
    // bounds check, and threw ArrayIndexOutOfBounds mid-task
    val hostile = ("YUV4MPEG2 W46341 H46341 F25:1 C420\n" + "FRAME\n" + "xx")
      .getBytes("US-ASCII")
    // odd 5x3 C420: chroma is 2*ceil(5/2)*ceil(3/2)=12 bytes, not 15/2=7
    // — the wrong arithmetic desyncs the walk and reports nFrames=1
    def odd(y: Int): Array[Byte] =
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(15)(y.toByte) ++
        Array.fill(12)(0x80.toByte)
    val oddY4m = "YUV4MPEG2 W5 H3 F30:1 C420\n".getBytes("US-ASCII") ++
      odd(100) ++ odd(200)
    val media = Seq(
      (1L, hostile, "video/x-yuv4mpeg", hostile.length.toLong),
      (2L, oddY4m, "video/x-yuv4mpeg", oddY4m.length.toLong),
    ).toDF("doc_id", "blob", "mime", "n_bytes")
    val out = MediaOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(!out(1L).decoded, "dimension overflow must quarantine, not crash")
    val v = out(2L).features
    assert(out(2L).decoded && v(2) == 2f,
      s"odd-dim chroma arithmetic must keep both frames: ${v.mkString(",")}")
    assert(math.abs(v(6) - 100 / 255.0) < 1e-6, s"motion: ${v(6)}")
  }

  test("mjpeg frame walk skips EXIF-embedded thumbnails (an SOI scan would double-count)") {
    import spark.implicits._
    def jpegGray(level: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) im.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    // splice an APP1 segment whose payload CONTAINS a complete JPEG
    // (the EXIF-thumbnail shape) right after each frame's SOI
    def withThumb(frame: Array[Byte]): Array[Byte] = {
      val thumb = jpegGray(30)
      val payload = "Exif  ".getBytes("US-ASCII") ++ thumb
      val len = payload.length + 2
      frame.take(2) ++ Array(0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload ++
        frame.drop(2)
    }
    val mjpeg = withThumb(jpegGray(60)) ++ withThumb(jpegGray(180))
    val media = Seq((1L, mjpeg, "video/mjpeg", mjpeg.length.toLong))
      .toDF("doc_id", "blob", "mime", "n_bytes")
    val f = MediaOps.extractFeatures(spark, media).collect().head
    assert(f.decoded && f.codec == "mjpeg-luma")
    val v = f.features
    assert(v(2) == 2f,
      s"embedded thumbnails must not count as frames: nFrames=${v(2)}")
    // both sampled lumas come from the REAL frames (60, 180), never the
    // 30-level thumbnail: mean ~120/255, motion ~120/255
    assert(math.abs(v(4) - 120 / 255.0) < 0.02, s"lumaMean: ${v(4)}")
    assert(math.abs(v(6) - 120 / 255.0) < 0.02, s"motion: ${v(6)}")
  }

  test("mjpeg video content stats: concatenated JPEG frames, keyframe sample bounded at 3") {
    import spark.implicits._
    def jpegGray(level: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) im.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    // five frames at stepped gray levels: the sample takes first /
    // middle / last (40, 120, 200), never all five
    val levels = Seq(40, 80, 120, 160, 200)
    val mjpeg = levels.map(jpegGray).reduce(_ ++ _)
    val media = Seq((1L, mjpeg, "video/mjpeg", mjpeg.length.toLong))
      .toDF("doc_id", "blob", "mime", "n_bytes")
    val f = MediaOps.extractFeatures(spark, media).collect().head
    assert(f.decoded && f.codec == "mjpeg-luma", s"${f.codec}/${f.decoded}")
    val v = f.features
    assert(v(0) == 8f && v(1) == 8f && v(2) == 5f,
      s"w/h/frames: ${v.mkString(",")}")
    assert(v(7) == 3f, s"keyframe sample must stay bounded: ${v(7)}")
    // JPEG of a solid gray round-trips near-exactly; the sampled means
    // are ~(40+120+200)/3/255 and motion ~80/255
    assert(math.abs(v(4) - 120 / 255.0) < 0.02, s"lumaMean: ${v(4)}")
    assert(math.abs(v(6) - 80 / 255.0) < 0.02, s"motion: ${v(6)}")
  }
}

/** Top-level (not test-class-nested, which would drag a non-serializable
  * $outer into the executor closure): the stand-in for a real JNI mp3
  * decoder a cluster image might ship. Refuses empty payloads so the
  * fall-through path is exercisable. */
class FakeMp3Codec extends MediaOps.MediaCodec {
  val name = "fake-mp3"
  def claims(mime: String): Boolean = mime == "audio/mpeg"
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    if (bytes.isEmpty) None
    else Some(Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, bytes.length.toFloat))
}
