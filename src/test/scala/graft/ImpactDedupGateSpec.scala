package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ImpactDedupGate, TextOps}

/** The lexical impact-index dedup gate (r20): refusal by self-score
  * coverage against a persisted store, id-registry refusal of replays
  * and re-worded re-ingestions, ingest append-back, and the enforced
  * freshness policy.
  */
class ImpactDedupGateSpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: each doc carries a distinctive rare tail (high idf
    * → dominates its own bag) plus shared filler, so a copy's bag is
    * covered exactly by its stored twin and a fresh doc's is not.
    */
  private def corpus(): DataFrame =
    (0 until 50).map { i =>
      (1000L + i,
        s"alpha beta gamma filler common words rare$i unique$i tail${i}x")
    }.toDF("doc_id", "text")

  private def freeze(): String = {
    val p = Files.createTempDirectory("graft_lexgate").toString + "/idx"
    TextOps.writeImpactIndex(corpus(), p)
    p
  }

  test("exact and near copies refuse; genuinely fresh docs admit") {
    val path = freeze()
    val batch = Seq(
      // exact copy of doc 1007 under a NEW id: bag covered 1.0 → refuse
      (1L, "alpha beta gamma filler common words rare7 unique7 tail7x"),
      // near copy of 1012: one filler word dropped, every distinctive
      // term intact — the stored twin still covers ~0.95 of the (all
      // in-vocab) self mass → refuse
      (2L, "alpha beta gamma filler common rare12 unique12 tail12x"),
      // fresh: novel rare terms, only the common filler is shared — the
      // novel terms score at df=0 (max idf), so the uncoverable self
      // mass dominates → admit (without the novel-mass component the
      // filler coverage would read ≈1.0 and refuse exactly the freshest
      // doc)
      (3L, "alpha beta gamma filler common words freshrare freshunique freshtail"),
      // pure novel vocabulary: no in-vocab term, no candidates → admit
      (4L, "zzq1 zzq2 zzq3 zzq4")
    ).toDF("doc_id", "text")
    val kept = ImpactDedupGate.gate(batch, path)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L),
      s"expected copies 1,2 refused and 3,4 admitted, got kept=$kept")
  }

  test("τ dials refusal: at a looser threshold the partial copy admits, the exact copy never does") {
    val path = freeze()
    // two thirds of the distinctive mass comes from doc 1012, one third
    // from 1033 — coverage by the best single candidate sits BETWEEN
    // the two thresholds, so τ decides
    val near = Seq(
      (2L, "alpha beta gamma filler common words rare12 unique12 rare33")
    ).toDF("doc_id", "text")
    val strict = ImpactDedupGate.gate(near, path, tau = 0.5).count()
    val loose = ImpactDedupGate.gate(near, path, tau = 0.99).count()
    assert(strict == 0 && loose == 1,
      s"τ must decide a ~0.67-coverage doc: strict=$strict loose=$loose")
    val exact = Seq(
      (5L, "alpha beta gamma filler common words rare3 unique3 tail3x")
    ).toDF("doc_id", "text")
    assert(ImpactDedupGate.gate(exact, path, tau = 0.99).isEmpty,
      "an exact copy covers its own bag fully and must refuse at any τ ≤ 1")
  }

  test("registry refusal: a known doc_id refuses even fully re-worded (below any lexical τ)") {
    val path = freeze()
    // 1009 is a corpus doc id; its text here shares nothing with the
    // stored version, so the lexical evidence alone would admit it
    val reworded = Seq((1009L, "entirely new body novel vocabulary only"))
      .toDF("doc_id", "text")
    assert(ImpactDedupGate.gate(reworded, path).isEmpty,
      "a registered id must refuse regardless of lexical distance")
    // same content under a NEW id is the lexical gate's job, not the
    // registry's: novel text under a new id admits
    val fresh = Seq((77L, "entirely new body novel vocabulary only"))
      .toDF("doc_id", "text")
    assert(ImpactDedupGate.gate(fresh, path).count() == 1)
  }

  test("ingest appends survivors; the next batch gates against them; replays refuse wholesale") {
    val path = freeze()
    // a FROZEN-VOCAB remix: six rare terms from six different corpus
    // docs — no single stored doc covers more than a sixth of the bag,
    // so it admits; being all in-vocab, its postings CAN merge into the
    // heads (novel vocabulary would stay unreachable until a re-freeze,
    // the documented frozen-context posture)
    val b1 = Seq((11L, "rare3 rare17 rare24 unique5 unique31 tail40x"))
      .toDF("doc_id", "text")
    val admitted = ImpactDedupGate.ingest(b1, path)
    assert(admitted.count() == 1)
    graft.CacheHygiene.release(admitted)
    // a COPY of the just-ingested doc under a new id now refuses: the
    // survivor joined the posting heads and covers the copy's bag 1.0
    val copy = Seq((12L, "rare3 rare17 rare24 unique5 unique31 tail40x"))
      .toDF("doc_id", "text")
    assert(ImpactDedupGate.gate(copy, path).isEmpty,
      "cross-batch dup must gate out after ingest")
    // a full replay of b1 (same id): registry refusal, ingest is a no-op
    val replay = ImpactDedupGate.ingest(b1, path)
    assert(replay.isEmpty, "a replayed batch must admit nothing")
    graft.CacheHygiene.release(replay)
  }

  test("freshness policy enforced: a drifted snapshot refuses the gate itself") {
    val path = freeze()
    val batch = Seq((21L, "alpha beta gamma filler common words a b c"))
      .toDF("doc_id", "text")
    // all-novel tiny-doc snapshot: both drift axes trip
    val shifted = (0 until 300).map(i => (5000L + i, s"nv$i xq$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      ImpactDedupGate.gate(batch, path, freshnessCorpus = Some(shifted)))
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // the fresh snapshot (the build corpus) serves
    assert(ImpactDedupGate.gate(batch, path,
      freshnessCorpus = Some(corpus())).count() == 1)
  }

  test("gate join shape: the store never shuffles even with auto-broadcast off") {
    val path = freeze()
    val batch = Seq((31L, "alpha beta gamma filler common words x y z"))
      .toDF("doc_id", "text")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = ImpactDedupGate.gate(batch, path)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"gate joins must stay broadcast probes into the scanned store:\n$plan")
      assert(out.count() == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
