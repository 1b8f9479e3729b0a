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
}
