package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, TextOps}

class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)], maxIter: Int = 50) = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, star, and disjoint components all label to the component min") {
    // a 64-node chain (diameter 63): one-hop label propagation would need
    // ~63 rounds; the star algorithm must close it in O(log n)
    val chain = (1L until 64L).map(i => (i, i + 1))
    val out = labelsOf(chain)
    assert(out.size == 64 && out.values.forall(_ == 1L),
      s"chain must collapse to min=1: ${out.toSeq.sortBy(_._1).take(8)}")
    assert(ConnectedComponents.lastRounds <= 10,
      s"64-chain must converge in O(log n) rounds, took ${ConnectedComponents.lastRounds}")

    // star + separate triangle + self-loops + duplicate edges
    val mixed = Seq((10L, 2L), (10L, 3L), (10L, 4L), (4L, 10L), (7L, 7L),
      (20L, 21L), (21L, 22L), (22L, 20L), (20L, 21L))
    val out2 = labelsOf(mixed)
    assert(out2(10L) == 2L && out2(3L) == 2L && out2(4L) == 2L)
    assert(out2(20L) == 20L && out2(21L) == 20L && out2(22L) == 20L)
    assert(out2(7L) == 7L, "a self-loop-only node is its own component")
  }

  test("star-set input converges with ZERO star rounds (r22 exact star test)") {
    // disjoint min-rooted stars: the round-0 stats job must detect the
    // fixpoint directly — no star-op round, labels still exact
    val stars = Seq((1L, 5L), (1L, 6L), (1L, 7L), (10L, 11L), (20L, 21L), (20L, 22L))
    val out = labelsOf(stars)
    assert(ConnectedComponents.lastRounds == 0,
      s"already-star edges must close in 0 rounds, took ${ConnectedComponents.lastRounds}")
    assert(out(5L) == 1L && out(6L) == 1L && out(7L) == 1L &&
      out(11L) == 10L && out(21L) == 20L && out(22L) == 20L)
    // NOT a star set despite unique members: 2 is a member (of 1) and a
    // center (of 3) — the mixed-side test must force a round
    val chain3 = Seq((1L, 2L), (2L, 3L))
    val out2 = labelsOf(chain3)
    assert(ConnectedComponents.lastRounds >= 1)
    assert(out2(2L) == 1L && out2(3L) == 1L)
    // NOT a star set despite disjoint sides: member 5 appears twice
    // (stars 1 and 2 share it) — the duplicate-member test must fire
    val shared = Seq((1L, 5L), (2L, 5L))
    val out3 = labelsOf(shared)
    assert(ConnectedComponents.lastRounds >= 1)
    assert(out3(1L) == 1L && out3(2L) == 1L && out3(5L) == 1L)
  }

  test("deterministic under repartitioning; empty edges; non-convergence is loud") {
    import spark.implicits._
    val edges = (1 to 200).map(i => ((i % 50).toLong, (i % 37).toLong + 50L))
    val a = labelsOf(edges)
    val b = ConnectedComponents.run(edges.toDF("src", "dst").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "labels must not depend on input partitioning")

    assert(ConnectedComponents.run(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)

    intercept[IllegalStateException](labelsOf((1L until 64L).map(i => (i, i + 1)), maxIter = 1))
  }

  test("q96 keep-best: the higher-QUALITY member survives, not the smaller id; ties break to min id") {
    import spark.implicits._
    // A and B are 3-shingle near-dups (one token differs in 30 -> jaccard
    // ~0.81); B's differing token is a stopword, so B scores higher
    // quality. A min-id rule would keep 1 - the quality rule must keep 2.
    val base = (1 to 30).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = base.updated(14, "the").mkString(" ")
    val docs = Seq(
      (1L, a, "en"), (2L, b, "en"),
      (3L, "totally unrelated singleton body of words here", "en"),
      // identical twins: equal quality, tie must keep the smaller id
      (10L, base.map(w => s"t$w").mkString(" "), "en"),
      (11L, base.map(w => s"t$w").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.keepBestOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 2L)),
      s"cluster {1,2}: 2 members, keeper must be the higher-quality doc 2: $out")
    assert(out(3L) == ((1L, 3L)), "singletons keep themselves")
    assert(out(10L) == ((2L, 10L)), s"equal quality ties to the smaller id: $out")
  }

  test("q94: components equal brute-force transitive closure of the q35 pairs") {
    val d = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.documents(spark, d)
    val pairs = TextOps.ngramJaccard(docs, Int.MaxValue)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find as the independent reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = TextOps.q94DedupComponents(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    expected.foreach { case (id, rep) =>
      assert(got(id) == rep, s"doc $id: got ${got(id)}, union-find says $rep")
    }
    // everyone else is a singleton keeper
    assert(got.count { case (id, rep) => id == rep } ==
      got.size - expected.count { case (id, rep) => id != rep })
  }

  test("releaseTree frees the checkpoints behind the returned labels join; near-root release cannot") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = ConnectedComponents.run(
      (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst"))
    assert(labels.count() == 40L) // fully consume the frame first
    val minted = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(minted.nonEmpty, "run must leave its backing checkpoints alive")
    // the labels are a JOIN over the checkpoints, so the near-root
    // release is (by design) a no-op here — this is the r14-advice leak
    graft.CacheHygiene.release(labels)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before) == minted,
      "near-root release must not reach under a join")
    // the whole-tree release reaches every LogicalRDD leaf
    graft.CacheHygiene.releaseTree(labels)
    assert((spark.sparkContext.getPersistentRDDs.keySet & minted).isEmpty,
      "releaseTree must unpersist every checkpoint under the returned plan")
  }
}
