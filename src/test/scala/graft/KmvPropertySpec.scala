package graft

import org.scalacheck.{Gen, rng}

import org.apache.spark.sql.functions._

/** Properties for the KMV sketch: over random long multisets and random
  * partition splits, the aggregate must equal the mathematical
  * definition — the k smallest DISTINCT values — and merging per-split
  * sketches must equal sketching the whole. The DuckDB oracle pins one
  * corpus bit-for-bit; these pin the contract across shapes it never
  * shows (heavy duplication, fewer distinct values than k, adversarial
  * value clusters, k = 2). (Raw ScalaCheck generators; the
  * scalatestplus bridge isn't on the offline classpath.)
  */
class KmvPropertySpec extends SparkSpec {

  private case class KCase(vals: Seq[Long], k: Int, parts: Int)

  private val caseGen: Gen[KCase] = for {
    n <- Gen.choose(0, 200)
    k <- Gen.choose(2, 16)
    parts <- Gen.choose(1, 7)
    // narrow value domain so duplicates and near-ties actually occur
    vals <- Gen.listOfN(n, Gen.choose(0L, 40L))
  } yield KCase(vals, k, parts)

  private def sample(seedN: Long): KCase =
    caseGen(Gen.Parameters.default, rng.Seed(seedN)).get

  private def reference(vals: Seq[Long], k: Int): Seq[Long] =
    vals.distinct.sorted.take(k)

  private def sketchOf(vals: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    val df = if (vals.isEmpty) Seq.empty[Long].toDF("h")
    else vals.toDF("h").repartition(parts)
    df.agg(graft.plans.GraftFunctions.kmv_sketch(col("h"), k).as("s"))
      .collect()(0).getAs[scala.collection.Seq[Long]](0).toSeq
  }

  test("kmv_sketch equals the k-smallest-distinct definition over random multisets and splits") {
    (1L to 60L).foreach { seed =>
      val c = sample(seed)
      val got = sketchOf(c.vals, c.k, c.parts)
      assert(got == reference(c.vals, c.k),
        s"seed=$seed k=${c.k} parts=${c.parts}: $got vs ${reference(c.vals, c.k)}")
    }
  }

  test("merging per-split sketches equals sketching the union (the streaming-store contract)") {
    (100L to 140L).foreach { seed =>
      val c = sample(seed)
      if (c.vals.nonEmpty) {
        val mid = c.vals.length / 2
        val merged = reference(
          sketchOf(c.vals.take(mid), c.k, 1) ++
            sketchOf(c.vals.drop(mid), c.k, 1), c.k)
        assert(merged == reference(c.vals, c.k),
          s"seed=$seed: per-split merge diverged from the whole")
      }
    }
  }
}
