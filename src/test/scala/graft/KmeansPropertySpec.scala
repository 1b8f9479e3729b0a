package graft

import org.scalacheck.{Gen, rng}
import graft.operators.VectorOps

/** Properties for the integer-exact k-means family: over random small
  * corpora (dims 1–4, grid-valued components so zero vectors and exact
  * ties actually occur), [[VectorOps.kmeansAssign]] must equal a pure
  * Scala reimplementation of the same fixed-point Lloyd rounds, and
  * [[VectorOps.semDedup]]'s kept set must equal the brute-force drop
  * rule over the model's labels. This is the randomized twin of the
  * DuckDB oracle: the oracle pins ONE corpus bit-for-bit, these pin the
  * arithmetic contract across shapes the corpus never shows (k > n,
  * singleton clusters, duplicate vectors, zero vectors, distance ties).
  * (Raw ScalaCheck generators; the scalatestplus bridge isn't on the
  * offline classpath.)
  */
class KmeansPropertySpec extends SparkSpec {

  private case class KCase(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int,
      tau: Double)

  private val caseGen: Gen[KCase] = for {
    dims <- Gen.choose(1, 4)
    n <- Gen.choose(1, 25)
    k <- Gen.choose(1, 5)
    iters <- Gen.choose(1, 3)
    tau <- Gen.oneOf(-1.0, 0.0, 0.3, 0.7, 0.95, 2.0)
    comps <- Gen.listOfN(n * dims, Gen.choose(-8, 8).map(_ * 0.25f))
  } yield KCase(
    comps.grouped(dims).toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    k, iters, tau)

  private def sample(seedN: Long): KCase =
    caseGen(Gen.Parameters.default, rng.Seed(seedN)).get

  /** Pure-Scala mirror of kmeansAssign's arithmetic: same fixed-point
    * quantization, same seed rule, same (d2, cid) tie-break, same
    * floor-of-double-division centroid update, same empty-cluster
    * carry-over. Any divergence is a bug in one of them.
    */
  private def modelAssign(c: KCase): Map[Long, (Long, Long)] = {
    val iv: Seq[(Long, Array[Long])] = c.vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
    }
    var centroids: Seq[(Long, Array[Long])] =
      iv.sortBy(_._1).take(c.k).map { case (id, q) => id -> q.clone() }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def best(q: Array[Long]): (Long, Long) =
      centroids.map { case (cid, cv) => (d2(q, cv), cid) }.min
    for (_ <- 1 until c.iters) {
      val byCid = iv.map { case (_, q) => (best(q)._2, q) }.groupBy(_._1)
      centroids = centroids.map { case (cid, cv) =>
        byCid.get(cid).fold(cid -> cv) { members =>
          cid -> Array.tabulate(cv.length) { p =>
            val vs = members.map(_._2(p))
            math.floor(vs.sum.toDouble / vs.length).toLong
          }
        }
      }
    }
    iv.map { case (id, q) => val b = best(q); id -> (b._2, b._1) }.toMap
  }

  /** Brute-force drop rule over the model's labels, with the same
    * zero-norm guard (no direction → never drops, never dropped). */
  private def modelKept(c: KCase): Map[Long, Boolean] = {
    val labels = modelAssign(c).map { case (id, (cl, _)) => id -> cl }
    def vecOf(id: Long): Seq[Double] =
      c.vecs.find(_._1 == id).get._2.map(_.toDouble)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
    c.vecs.map { case (id, _) =>
      val v = vecOf(id); val nv = norm(v)
      val dropped = c.vecs.exists { case (oid, _) =>
        oid < id && labels(oid) == labels(id) && {
          val o = vecOf(oid); val no = norm(o)
          nv * no > 0 && dot(v, o) / (nv * no) >= c.tau
        }
      }
      id -> !dropped
    }.toMap
  }

  test("kmeansAssign equals the pure-Scala model over 20 random corpora") {
    import spark.implicits._
    (1 to 20).foreach { i =>
      val c = sample(i.toLong)
      val df = c.vecs.toDF("vec_id", "embedding")
      val res = VectorOps.kmeansAssign(df, c.k, c.iters)
      val got = res.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == modelAssign(c),
        s"seed $i (n=${c.vecs.size}, k=${c.k}, iters=${c.iters})")
      graft.CacheHygiene.releaseTree(res)
    }
  }

  test("semDedup's kept set equals the brute-force drop rule over 20 random corpora") {
    import spark.implicits._
    (21 to 40).foreach { i =>
      val c = sample(i.toLong)
      val df = c.vecs.toDF("vec_id", "embedding")
        .withColumn("label", org.apache.spark.sql.functions.lit(0))
      val res = VectorOps.semDedup(df, c.k, c.iters, c.tau)
      val got = res.collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == modelKept(c),
        s"seed $i (n=${c.vecs.size}, k=${c.k}, iters=${c.iters}, tau=${c.tau})")
      graft.CacheHygiene.releaseTree(res)
    }
  }
}
