package graft

import org.scalacheck.{Gen, rng}

import graft.multimodal.HeaderCodecs
import graft.operators.{TextOps, VectorOps}

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

  test("keepFirstScrub property: matches a direct reference over random duplicate-heavy corpora") {
    import spark.implicits._
    // tiny vocab forces real cross-doc and within-doc gram collisions
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nDocs <- Gen.choose(2, 12)
      texts <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 24)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def reference(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").toSeq
      }
      val occ = for {
        (id, ws) <- toks; p <- 0 to ws.length - n
      } yield (ws.slice(p, p + n).mkString(" "), id, p)
      val covered = occ.groupBy(_._1).valuesIterator
        .filter(_.size >= 2)
        .flatMap(_.sortBy(o => (o._2, o._3)).drop(1))
        .toSeq.groupBy(_._2)
        .map { case (id, os) =>
          id -> os.flatMap(o => o._3 until o._3 + n).toSet
        }
      toks.map { case (id, ws) =>
        val cov = covered.getOrElse(id, Set.empty[Int])
        val kept = ws.zipWithIndex.collect { case (w, i) if !cov(i) => w }
        id -> ((ws.length.toLong, cov.size.toLong, kept.mkString(" ")))
      }.toMap
    }
    for (seed <- 0 until 12) {
      val corpus = corpusGen(Gen.Parameters.default, rng.Seed(7000L + seed)).get
      val got = TextOps.keepFirstScrub(corpus.toDF("doc_id", "text"), n = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == reference(corpus, 3), s"seed $seed: corpus $corpus")
    }
  }

  test("hardNegatives property: matches a brute-force reference over random labeled vectors") {
    import spark.implicits._
    val setGen: Gen[Seq[(Long, String, Array[Float])]] = for {
      nv <- Gen.choose(4, 20)
      rows <- Gen.listOfN(nv, for {
        label <- Gen.oneOf("A", "B", "C")
        // small integer components: dots are exact, ties actually occur
        vec <- Gen.listOfN(4, Gen.choose(0, 3))
      } yield (label, vec.map(_.toFloat).toArray))
    } yield rows.zipWithIndex.map { case ((l, v), i) => (i.toLong, l, v) }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.map(i => x(i).toDouble * y(i).toDouble).sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    for (seed <- 0 until 10) {
      val rows0 = setGen(Gen.Parameters.default, rng.Seed(9000L + seed)).get
      // all-zero vectors produce NaN cosines in ANY formulation; the
      // generator avoids them (the planted spec covers real geometry)
      val rows = rows0.map { case (id, l, v) =>
        if (v.forall(_ == 0f)) (id, l, Array(1f, 0f, 0f, 0f)) else (id, l, v)
      }
      val span = 3L
      val expected = (for {
        (qid, qlab, qv) <- rows if qid < span
        posCos = rows.collect {
          case (cid, l, v) if cid != qid && l == qlab => cos(qv, v)
        } match {
          case Seq() => None
          case cs => Some(cs.map(c => math.floor(c * 1e6 + 0.5).toLong).max)
        }
        negs = rows.collect { case (cid, l, v) if l != qlab => (cid, cos(qv, v)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(5)
        ((cid, c), i) <- negs.zipWithIndex
      } yield (qid, qlab, cid,
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        (i + 1).toLong, posCos,
        posCos.map { p =>
          val ci = math.floor(c * 1e6 + 0.5).toLong
          if (ci >= p) "hard" else if (ci > p - 100000L) "semihard" else "easy"
        })).toSet
      val got = VectorOps.hardNegatives(
        rows.toDF("vec_id", "label", "embedding"), k = 5, querySpan = span)
        .collect().map { r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
            r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getString(6)))
        }.toSet
      assert(got == expected, s"seed $seed")
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
    // every prefix of a real box chain either parses or returns None.
    // The shared FULL fixture (with trak/tkhd/mdia) exercises the inner
    // walks the movie-header-only payload cannot reach.
    for (mp4 <- Seq(BmffFixture.minimalMp4(), BmffFixture.plantedMp4())) {
      assert(HeaderCodecs.decodeBmffHeaders(mp4).isDefined)
      for (cut <- 0 until mp4.length)
        HeaderCodecs.decodeBmffHeaders(mp4.take(cut)) // must not throw
    }
  }
}
