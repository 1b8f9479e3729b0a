package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("binned range join equals the naive inequality join, bin width irrespective") {
    import spark.implicits._
    // points 0..999; intervals of assorted widths incl. empty + bin-straddling
    val points = (0L until 1000L).map(p => (p, s"pt$p")).toDF("p", "ptag")
    val intervals = Seq(
      (1L, 0L, 10L), (2L, 5L, 105L), (3L, 99L, 100L), (4L, 100L, 100L), // empty
      (5L, 950L, 2000L), (6L, 0L, 1000L), (7L, 777L, 778L))
      .toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 64L, 10000L)) {
      val binned = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.toSet.size, s"duplicates at binWidth=$w")
      assert(binned.toSet == naive, s"mismatch at binWidth=$w")
    }
  }

  test("plans as a hash equi-join on the bin key, never a nested loop") {
    import spark.implicits._
    val points = (0L until 100L).map(p => (p, p)).toDF("p", "v")
    val intervals = (0L until 20L).map(i => (i, i * 10, i * 10 + 15)).toDF("iv_id", "lo", "hi")
    val df = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 16L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi join on the bin key:\n$plan")
  }

  test("property: binned == naive on random point/interval sets and bin widths") {
    import spark.implicits._
    import org.scalacheck.{Gen, rng}
    val pointsGen = Gen.listOfN(60, Gen.choose(-50L, 150L))
    val ivGen = Gen.listOfN(25, for {
      lo <- Gen.choose(-60L, 140L)
      w <- Gen.choose(-5L, 40L) // negative/zero widths = empty intervals
    } yield (lo, lo + w))
    def sample[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, rng.Seed(seed)).get
    (1 to 8).foreach { i =>
      val pts = sample(pointsGen, i * 3L).zipWithIndex
        .map { case (p, ix) => (ix.toLong, p) }.toDF("pid", "p")
      val ivs = sample(ivGen, i * 3L + 1).zipWithIndex
        .map { case ((lo, hi), ix) => (ix.toLong, lo, hi) }.toDF("iv_id", "lo", "hi")
      val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = 1L + (i % 4) * 6 // bin widths 1, 7, 13, 19
      val binned = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", w)
        .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.toSet.size, s"seed $i width $w: duplicates")
      assert(binned.toSet == naive, s"seed $i width $w: mismatch")
    }
  }

  test("guards: fractional columns rejected, oversized intervals fail fast") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 10L)).toDF("iv_id", "lo", "hi")
    // fractional bound column -> plan-time rejection
    val fracIvs = Seq((1L, 0.5, 2.5)).toDF("iv_id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", fracIvs, "lo", "hi", 1L)
    }
    assert(e.getMessage.contains("integral"))
    // a sentinel open-ended interval must error clearly, not OOM
    val dirty = Seq((1L, 0L, 10L), (2L, 0L, Long.MaxValue / 2)).toDF("iv_id", "lo", "hi")
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", dirty, "lo", "hi", 10L, maxBinsPerInterval = 100)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("maxBinsPerInterval")),
      s"expected the width guard to fire, got: $err")
    // opting out with Long.MaxValue must not overflow into rejecting everything
    val ok = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 1L,
      maxBinsPerInterval = Long.MaxValue).collect()
    assert(ok.length == 1)
  }

  test("property: interval overlap binned == naive, duplicate-free, across widths") {
    import spark.implicits._
    import org.scalacheck.{Gen, rng}
    val ivGen = Gen.listOfN(30, for {
      lo <- Gen.choose(-60L, 140L)
      w <- Gen.choose(-5L, 40L)
    } yield (lo, lo + w))
    def sample[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, rng.Seed(seed)).get
    (1 to 6).foreach { i =>
      val a = sample(ivGen, i * 7L).zipWithIndex
        .map { case ((lo, hi), ix) => (ix.toLong, lo, hi) }.toDF("a_id", "a_lo", "a_hi")
      val b = sample(ivGen, i * 7L + 3).zipWithIndex
        .map { case ((lo, hi), ix) => (ix.toLong, lo, hi) }.toDF("b_id", "b_lo", "b_hi")
      val naive = a.join(b,
          col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi") &&
            col("a_hi") > col("a_lo") && col("b_hi") > col("b_lo"))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = 1L + (i % 3) * 9
      val binnedRes = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binnedRes.length == binnedRes.toSet.size,
        s"seed $i width $w: canonical-bin dedup failed")
      assert(binnedRes.toSet == naive, s"seed $i width $w: mismatch")
    }
  }

  test("q62 shape: every interval week counts only its own points") {
    val res = RangeJoin.q62RangeJoin(spark, "/root/testdata/sf0.001").collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Long]("n_shipped_in_week") > 0))
  }
}
