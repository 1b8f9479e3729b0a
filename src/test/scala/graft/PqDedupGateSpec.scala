package graft

import java.nio.file.Files

import graft.operators.PqDedupGate

/** The planted geometries below use cIters = iters = 1, so the frozen
  * coarse centroids are EXACTLY the first kc reference vectors and the
  * residual codebooks EXACTLY the first k reference residuals — every
  * routing decision, code, and ADC distance in these tests is
  * hand-derived integer arithmetic, no Lloyd drift.
  */
class PqDedupGateSpec extends SparkSpec {

  // int-vec scale: floats are n·1e-6, so these components are exact
  private val massA = Seq(1.0f, 0.0f, 0.0f, 0.0f) // intVec (1e6, 0, 0, 0)
  private val massB = Seq(0.0f, 1.0f, 0.0f, 0.0f)

  test("exact copies of STORED codes gate out across batches; novel vectors admit; store holds codes only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqgate").toString
    val geom = s"$dir/geom"
    val store = s"$dir/store"
    // reference: the two masses (→ coarse centroids) + two vectors whose
    // residuals seed the codebooks with (±20000, 0) / (0, 0) slices
    PqDedupGate.writeGeometry(
      Seq((0L, massA, 0), (1L, massB, 0),
        (2L, Seq(1.02f, 0.0f, 0.0f, 0.0f), 0),
        (3L, Seq(0.0f, 1.0f, 0.02f, 0.0f), 0))
        .toDF("vec_id", "embedding", "label"),
      geom, kc = 2, cIters = 1, m = 2, k = 4, iters = 1)

    // empty store admits everything; v10 ≡ reference vec 2, so its
    // residual (20000,0,0,0) reconstructs with ZERO distortion
    val b1 = Seq((10L, Seq(1.02f, 0.0f, 0.0f, 0.0f), 0),
      (11L, massB, 0)).toDF("vec_id", "embedding", "label")
    assert(PqDedupGate.ingest(b1, geom, store, theta = 0L).count() == 2)

    // batch 2: an exact copy of stored v10 (ADC d2 = 0 → refused even at
    // theta = 0) plus a genuinely novel direction (admits)
    val b2 = Seq(
      (20L, Seq(1.02f, 0.0f, 0.0f, 0.0f), 0),
      (21L, Seq(0.0f, 0.0f, 0.0f, 1.0f), 0),
    ).toDF("vec_id", "embedding", "label")
    val acc2 = PqDedupGate.ingest(b2, geom, store, theta = 0L)
    assert(acc2.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(21L),
      "the exact code-level copy must be gated out")

    // the store holds (cluster, vec_id, codes) — NO embedding column:
    // the compression is the point
    val st = PqDedupGate.readStore(spark, store)
    assert(st.columns.toSeq == Seq("cluster", "vec_id", "codes"))
    assert(st.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L, 21L))
  }

  test("near-copy across the cluster boundary: nProbe=1 misses it, nProbe=2 catches it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqgate2").toString
    val geom = s"$dir/geom"
    val store = s"$dir/store"
    // v = (0.49, 0.51, 0, 0) routes to massB (d2 4.802e11 < 5.202e11);
    // w = (0.51, 0.49, 0, 0) routes to massA. v sits in the reference,
    // so its residual v−cB = (490000, −490000, 0, 0) is IN the codebook
    // and v's stored codes reconstruct it exactly.
    val v = Seq(0.49f, 0.51f, 0.0f, 0.0f)
    val w = Seq(0.51f, 0.49f, 0.0f, 0.0f)
    PqDedupGate.writeGeometry(
      Seq((0L, massA, 0), (1L, massB, 0), (2L, v, 0), (3L, w, 0))
        .toDF("vec_id", "embedding", "label"),
      geom, kc = 2, cIters = 1, m = 2, k = 4, iters = 1)
    assert(PqDedupGate.ingest(
      Seq((10L, v, 0)).toDF("vec_id", "embedding", "label"),
      geom, store, theta = 0L).count() == 1)

    // ADC(w probed into cB, stored v) = ‖(w−cB) − (v−cB)‖² = ‖w−v‖²
    //  = 20000² + 20000² = 8e8 exactly. theta = 1e9 sits above it and
    // far below the inter-mass floor (~4.8e11).
    val batch = Seq((20L, w, 0)).toDF("vec_id", "embedding", "label")
    assert(PqDedupGate.gate(batch, geom, store, theta = 1000000000L,
        nProbe = 1).count() == 1,
      "nProbe=1 probes only w's own cluster (massA) — the boundary " +
        "straggler documented to slip through")
    assert(PqDedupGate.gate(batch, geom, store, theta = 1000000000L,
        nProbe = 2).count() == 0,
      "nProbe=2 also probes massB, where the stored twin lives")
  }

  test("missing geometry is loud; bad nProbe/theta are loud; missing store admits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqgate3").toString
    val b = Seq((1L, massA, 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException](
      PqDedupGate.gate(b, s"$dir/nope", s"$dir/store", theta = 0L))
    assert(e.getMessage.contains("writeGeometry"))
    PqDedupGate.writeGeometry(
      Seq((0L, massA, 0), (1L, massB, 0)).toDF("vec_id", "embedding", "label"),
      s"$dir/geom", kc = 2, cIters = 1, m = 2, k = 2, iters = 1)
    intercept[IllegalArgumentException](
      PqDedupGate.gate(b, s"$dir/geom", s"$dir/store", theta = 0L, nProbe = 3))
    intercept[IllegalArgumentException](
      PqDedupGate.gate(b, s"$dir/geom", s"$dir/store", theta = -1L))
    assert(PqDedupGate.gate(b, s"$dir/geom", s"$dir/store", theta = 0L)
      .count() == 1)
  }

  test("distortionDrift: same-distribution batch reads stable, shifted batch reads rebuild") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqdrift").toString
    val geom = s"$dir/geom"
    // reference: a spread around massA whose residual variety exceeds
    // the k=2 codebook, so the baseline has NONZERO distortion buckets
    def near(i: Int) = Seq(1.0f + i / 100f, i / 200f, 0.0f, 0.0f)
    PqDedupGate.writeGeometry(
      (0 until 20).map(i => (i.toLong, near(i), 0))
        .toDF("vec_id", "embedding", "label"),
      geom, kc = 1, cIters = 1, m = 2, k = 2, iters = 2)
    // a batch drawn from the same spread: distortion profile matches
    val same = PqDedupGate.distortionDrift(
      (0 until 20).map(i => (100L + i, near(i), 0))
        .toDF("vec_id", "embedding", "label"), geom).collect()(0)
    assert(same.getLong(0) == 20 && same.getLong(1) == 20)
    assert(same.getDouble(2) < 0.1,
      s"identical distribution must read stable, got psi=${same.getDouble(2)}")
    // a shifted batch: residuals land far from every codebook entry —
    // distortion mass moves to high buckets the reference never saw
    val shifted = PqDedupGate.distortionDrift(
      (0 until 20).map(i => (200L + i,
        Seq(1.0f, 0.9f + i / 100f, 0.8f, 0.0f), 0))
        .toDF("vec_id", "embedding", "label"), geom).collect()(0)
    assert(shifted.getDouble(2) > 0.25,
      s"shifted distribution must read rebuild, got psi=${shifted.getDouble(2)}")
    // a geometry frozen without the baseline is loud, not guessed
    val e = intercept[IllegalArgumentException] {
      val fs = new org.apache.hadoop.fs.Path(s"$geom/distortion")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$geom/distortion"), true)
      PqDedupGate.distortionDrift(
        Seq((1L, massA, 0)).toDF("vec_id", "embedding", "label"), geom)
    }
    assert(e.getMessage.contains("re-freeze"))
  }

  test("gate join shape: the code store never shuffles, even with auto-broadcast off") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqgate4").toString
    PqDedupGate.writeGeometry(
      Seq((0L, massA, 0), (1L, massB, 0)).toDF("vec_id", "embedding", "label"),
      s"$dir/geom", kc = 2, cIters = 1, m = 2, k = 2, iters = 1)
    PqDedupGate.ingest(
      (1L to 50L).map(i => (i, Seq(1.0f, i / 100f, 0.0f, 0.0f), 0))
        .toDF("vec_id", "embedding", "label"),
      s"$dir/geom", s"$dir/store", theta = 0L, nProbe = 1)
    val batch = Seq((100L, massB, 0)).toDF("vec_id", "embedding", "label")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = PqDedupGate.gate(batch, s"$dir/geom", s"$dir/store",
        theta = 1000000L)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"store-side join must stay a broadcast probe:\n$plan")
      assert(gated.count() == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
