package graft

import org.scalacheck.{Gen, rng}

import graft.multimodal.HeaderCodecs
import graft.operators.TextOps

/** Properties for the r16 objective transforms and the structural media
  * decoders, over shapes the planted specs never show. The oracle pins
  * one corpus bit-for-bit; these pin the CONTRACT on random inputs:
  * q141's PSM and q142's sentinel form must always reassemble to the
  * normalized original with in-bounds cuts (loss-free rearrangements,
  * never lossy edits), and the mp3/ogg/mp4 header walks must refuse
  * arbitrary bytes with None — never an exception, never a fake decode
  * with parsed-looking features. (Raw ScalaCheck generators; the
  * scalatestplus bridge isn't on the offline classpath.)
  */
class TransformPropertySpec extends SparkSpec {

  private val docGen: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 120)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.alphaLowerChar)
    } yield cs.mkString)
  } yield ws

  private def docs(seedN: Long, count: Int): Seq[(Long, String)] =
    (0 until count).map { i =>
      val ws = docGen(Gen.Parameters.default, rng.Seed(seedN + i)).get
      (i.toLong, ws.mkString(" "))
    }

  test("fimTransform property: every PSM row reassembles loss-free with in-bounds cuts") {
    import spark.implicits._
    val corpus = docs(seedN = 41L, count = 40)
    val out = TextOps.fimTransform(corpus.toDF("doc_id", "text"), rate = 1)
      .collect()
    val original = corpus.toMap
    var psm = 0
    for (r <- out) {
      val (id, n) = (r.getLong(0), r.getLong(2))
      if (r.getString(1) == "psm") {
        psm += 1
        val (a, b) = (r.getLong(3), r.getLong(4))
        assert(a >= 1 && a <= n - 2 && b >= a + 1 && b <= n - 1,
          s"doc $id cuts a=$a b=$b n=$n")
        val m = "<PRE> (.*) <SUF> (.*) <MID> (.*)".r
        val m(p, sfx, mid) = r.getString(5): @unchecked
        assert(s"$p $mid $sfx" == original(id), s"doc $id reassembly")
      } else {
        assert(n < 3, s"rate=1 must transform every eligible doc: $r")
        assert(r.getString(5) == original(id), s"doc $id plain")
      }
    }
    assert(psm > 0, "the generator must produce eligible docs")
  }

  test("spanCorrupt property: sentinel splice-back is loss-free at every generated length") {
    import spark.implicits._
    val corpus = docs(seedN = 97L, count = 40)
    val out = TextOps.spanCorrupt(corpus.toDF("doc_id", "text")).collect()
    val original = corpus.toMap
    for (r <- out) {
      val id = r.getLong(0)
      if (r.getString(1) == "t5") {
        val m = r.getLong(3)
        val inputs = r.getString(4).split(" ")
        val targets = r.getString(5).split(" ")
        assert(targets.length.toLong == 4 * m + 1 && targets.last == s"<X$m>",
          s"doc $id targets shape")
        val spans = targets.dropRight(1).grouped(4)
          .map(g => g.head -> g.tail.toSeq).toMap
        val rebuilt = inputs.flatMap(t =>
          if (t.startsWith("<X")) spans(t) else Seq(t)).mkString(" ")
        assert(rebuilt == original(id), s"doc $id splice-back")
      } else assert(r.getLong(2) < 3, s"only sub-width docs stay plain: $r")
    }
  }

  test("header decoders never throw and never fake-decode arbitrary bytes") {
    val byteGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 600)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    for (i <- 0 until 200) {
      val bytes = byteGen(Gen.Parameters.default, rng.Seed(1000L + i)).get
      // must return (not throw); random bytes virtually never parse as a
      // valid chained container, and a Some here must at least have come
      // from a structurally valid walk — assert no exception is the
      // contract, refusal is the overwhelmingly expected outcome
      HeaderCodecs.decodeMpegHeaders(bytes)
      HeaderCodecs.decodeOggHeaders(bytes)
      assert(HeaderCodecs.decodeBmffHeaders(bytes).isEmpty ||
        bytes.length >= 16, "a BMFF parse needs at least ftyp + one box")
    }
    // adversarial truncations of a VALID payload must refuse, not throw:
    // every prefix of a real box chain either parses or returns None
    val mp4 = {
      def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      def box(t: String, b: Array[Byte]) =
        be32(b.length + 8L) ++ t.getBytes("ISO-8859-1") ++ b
      box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
        box("moov", box("mvhd",
          be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++
            new Array[Byte](80)))
    }
    assert(HeaderCodecs.decodeBmffHeaders(mp4).isDefined)
    for (cut <- 0 until mp4.length)
      HeaderCodecs.decodeBmffHeaders(mp4.take(cut)) // must not throw
  }
}
