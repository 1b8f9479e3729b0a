package graft

import java.nio.file.Files

import graft.operators.SemanticDedupGate

class SemanticDedupGateSpec extends SparkSpec {

  // two well-separated masses + a probe kit: near-copies differ by a
  // tiny last-component nudge (cos ≈ 0.99998), novel vectors are
  // orthogonal-ish
  private def vec(base: Seq[Float], nudge: Float = 0f): Seq[Float] =
    base.dropRight(1) :+ (base.last + nudge)
  private val massA = Seq(1.0f, 0.0f, 0.0f, 0.01f)
  private val massB = Seq(0.0f, 1.0f, 0.0f, 0.01f)

  test("semantic near-copies of ingested vectors gate out across batches; novel vectors admit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_semgate").toString
    val centroids = s"$dir/centroids"
    val store = s"$dir/store"

    // reference corpus freezes the two-mass geometry
    SemanticDedupGate.writeCentroids(
      Seq((0L, massA, 0), (1L, massB, 0),
        (2L, vec(massA, 0.02f), 0), (3L, vec(massB, 0.02f), 0))
        .toDF("vec_id", "embedding", "label"),
      centroids, k = 2, iters = 2)

    // empty store admits everything
    val b1 = Seq((10L, massA, 0), (11L, massB, 0))
      .toDF("vec_id", "embedding", "label")
    assert(SemanticDedupGate.ingest(b1, centroids, store, tau = 0.99).count() == 2)

    // batch 2: a near-copy of the stored massA vector (new id, no shared
    // bytes needed — cosine is the identity) plus a genuinely novel one
    val b2 = Seq(
      (20L, vec(massA, 0.005f), 0),
      (21L, Seq(0.0f, 0.0f, 1.0f, 0.01f), 0),
    ).toDF("vec_id", "embedding", "label")
    val acc2 = SemanticDedupGate.ingest(b2, centroids, store, tau = 0.99)
    assert(acc2.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(21L),
      "the semantic near-copy must be gated out")

    // the admitted novel vector now guards ITS copies too
    val b3 = Seq((30L, Seq(0.0f, 0.0f, 1.0f, 0.011f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(SemanticDedupGate.ingest(b3, centroids, store, tau = 0.99).count() == 0)

    // store = exactly the admitted vectors, cluster-labeled
    val stored = SemanticDedupGate.readStore(spark, store)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(stored == Set(10L, 11L, 21L))
  }

  test("assignDrift: same-distribution batch quiet, shifted batch alerts, pre-baseline geometry loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_semdrift").toString
    val centroids = s"$dir/centroids"
    // a spread around one mass, so the freeze-time baseline has NONZERO
    // assignment-distance buckets (a degenerate all-zero-d2 baseline
    // would make any batch variance read as drift)
    def near(i: Int) = Seq(1.0f + i / 100f, i / 200f, 0.0f, 0.0f)
    SemanticDedupGate.writeCentroids(
      (0 until 20).map(i => (i.toLong, near(i), 0))
        .toDF("vec_id", "embedding", "label"),
      centroids, k = 2, iters = 2)
    // a batch drawn from the same spread: assignment profile matches
    val same = SemanticDedupGate.assignDrift(
      (0 until 20).map(i => (100L + i, near(i), 0))
        .toDF("vec_id", "embedding", "label"), centroids).collect()(0)
    assert(same.getLong(0) == 20 && same.getLong(1) == 20)
    assert(same.getDouble(2) < 0.1,
      s"identical distribution must read stable, got psi=${same.getDouble(2)}")
    // a shifted batch lands far from every frozen centroid: distance
    // mass moves to high buckets the reference never saw
    val shifted = SemanticDedupGate.assignDrift(
      (0 until 20).map(i => (200L + i, Seq(5.0f, 4.0f + i / 10f, 3.0f, 0.0f), 0))
        .toDF("vec_id", "embedding", "label"), centroids).collect()(0)
    assert(shifted.getDouble(2) > 0.25,
      s"shifted distribution must read rebuild, got psi=${shifted.getDouble(2)}")
    // a geometry frozen before the probe existed is loud, not guessed
    val bp = new org.apache.hadoop.fs.Path(s"$centroids.assign")
    bp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(bp, true)
    val e = intercept[IllegalArgumentException](
      SemanticDedupGate.assignDrift(
        Seq((1L, massA, 0)).toDF("vec_id", "embedding", "label"), centroids))
    assert(e.getMessage.contains("re-freeze"))
  }

  test("missing centroid table is loud; missing store admits; zero vector admits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_semgate2").toString
    val b = Seq((1L, massA, 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException](
      SemanticDedupGate.gate(b, s"$dir/nope", s"$dir/store", 0.9).count())
    assert(e.getMessage.contains("writeCentroids"), e.getMessage)

    SemanticDedupGate.writeCentroids(
      Seq((0L, massA, 0), (1L, massB, 0)).toDF("vec_id", "embedding", "label"),
      s"$dir/centroids", k = 2, iters = 1)
    // zero vector: cosine NaN, comparison false, admits (it has no
    // direction to be a copy OF)
    val z = Seq((5L, Seq(0.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(SemanticDedupGate.ingest(z, s"$dir/centroids", s"$dir/store", 0.9)
      .count() == 1)
    assert(SemanticDedupGate.ingest(z, s"$dir/centroids", s"$dir/store", 0.9)
      .count() == 1, "a zero vector never blocks anything, itself included")
  }

  test("gate join shape: the vector store never shuffles, even with auto-broadcast off") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_semgate3").toString
    SemanticDedupGate.writeCentroids(
      Seq((0L, massA, 0), (1L, massB, 0)).toDF("vec_id", "embedding", "label"),
      s"$dir/centroids", k = 2, iters = 1)
    SemanticDedupGate.ingest(
      (1L to 50L).map(i => (i, vec(massA, i / 100f), 0))
        .toDF("vec_id", "embedding", "label"),
      s"$dir/centroids", s"$dir/store", tau = 1.1) // tau>1: admit all 50
    val batch = Seq((100L, massB, 0)).toDF("vec_id", "embedding", "label")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = SemanticDedupGate.gate(batch, s"$dir/centroids",
        s"$dir/store", 0.99)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"store-side join must stay a broadcast probe:\n$plan")
      assert(gated.count() == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
