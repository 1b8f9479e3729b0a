package graft

import java.nio.file.Files

import graft.operators.IncrementalDedup

class IncrementalDedupSpec extends SparkSpec {

  test("near-dups of already-ingested docs are gated out across batches") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_inc_dedup").toString + "/sigs"
    val batch1 = Seq(
      (1L, "spark shuffle join window agg scan filter project exchange sort"),
      (2L, "totally different body about streaming watermarks and state stores"),
    ).toDF("doc_id", "text")

    // empty store admits everything
    val acc1 = IncrementalDedup.ingest(batch1, store)
    assert(acc1.count() == 2)

    // batch 2: a token-identical copy of doc 1 under a new id, plus a
    // genuinely fresh doc
    val batch2 = Seq(
      (10L, "spark shuffle join window agg scan filter project exchange sort"),
      (11L, "an unrelated brand new document body with many novel words"),
    ).toDF("doc_id", "text")
    val acc2 = IncrementalDedup.ingest(batch2, store)
    assert(acc2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L),
      "the near-dup of an ingested doc must be gated out")

    // the survivor's signatures landed: a copy of IT is now gated too
    val batch3 = Seq(
      (20L, "an unrelated brand new document body with many novel words")).toDF("doc_id", "text")
    assert(IncrementalDedup.ingest(batch3, store).count() == 0)

    // store holds signatures for exactly the accepted docs
    val storedDocs = IncrementalDedup.readSignatures(spark, store)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedDocs == Set(1L, 2L, 11L))
  }

  test("gate join shape: the signature store never shuffles, even with auto-broadcast off") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_sigshape").toString + "/sigs"
    IncrementalDedup.appendSignatures(
      (1L to 50L).map(i => (i, s"stored corpus document number $i with plenty of tokens"))
        .toDF("doc_id", "text"), store)
    val batch = Seq((100L, "a fresh incoming body of text with many new words")).toDF("doc_id", "text")
    // disabling size-based broadcast is the load-bearing part: the naive
    // batch-ANTI-store direction degrades to a SortMergeJoin here (the
    // store is the hash-build side), which at corpus scale shuffles the
    // whole store per micro-batch; the scan-shape gate must keep every
    // join broadcast by construction
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = IncrementalDedup.gate(batch, store)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"store-side join must stay a broadcast probe:\n$plan")
      assert(gated.count() == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
