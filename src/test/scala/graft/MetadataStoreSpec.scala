package graft

import java.nio.file.Files

import graft.sources.{BronzeLayer, MetadataStore}

class MetadataStoreSpec extends SparkSpec {

  test("gated ingest: re-delivered payloads never land in bronze twice") {
    val bronze = Files.createTempDirectory("graft_bronze_meta").toString
    val meta = Files.createTempDirectory("graft_meta").toString + "/store"

    val acc1 = MetadataStore.ingestWithGate(
      rawPostings(Seq("p1" -> "c1", "p2" -> "c2", "p3" -> "c3")), bronze, meta, "b1")
    assert(acc1.count() == 3, "empty store admits everything")
    assert(MetadataStore.read(spark, meta).count() == 3)

    // batch 2 re-delivers c2 under a new posting id + one new payload
    val acc2 = MetadataStore.ingestWithGate(
      rawPostings(Seq("p4" -> "c2", "p5" -> "c5")), bronze, meta, "b2")
    assert(acc2.select("posting_id").collect().map(_.getString(0)).toSeq == Seq("p5"),
      "the re-delivered payload must be gated out")

    val bronzeRows = BronzeLayer.readRaw(spark, bronze)
    assert(bronzeRows.count() == 4)
    assert(bronzeRows.select("raw_content").distinct().count() == 4,
      "no duplicate payload in bronze")
    assert(MetadataStore.read(spark, meta).count() == 4)
    assert(MetadataStore.read(spark, meta).select("etag").distinct().count() == 4)

    // full re-delivery of batch 2 gates to zero (idempotent re-ingest)
    val acc3 = MetadataStore.ingestWithGate(
      rawPostings(Seq("p4" -> "c2", "p5" -> "c5")), bronze, meta, "b3")
    assert(acc3.count() == 0)
    assert(BronzeLayer.readRaw(spark, bronze).count() == 4)
  }

  test("in-batch duplicates collapse to the first posting per etag") {
    val bronze = Files.createTempDirectory("graft_bronze_dup").toString
    val meta = Files.createTempDirectory("graft_meta_dup").toString + "/store"
    val acc = MetadataStore.ingestWithGate(
      rawPostings(Seq("a2" -> "dup", "a1" -> "dup", "a3" -> "x")), bronze, meta, "b1")
    assert(acc.count() == 2, "two rows of the same payload in one batch must collapse")
    val kept = acc.filter(org.apache.spark.sql.functions.col("raw_content") === "dup")
      .select("posting_id").head().getString(0)
    assert(kept == "a1", "deterministic winner: smallest posting_id")
    assert(BronzeLayer.readRaw(spark, bronze).count() == 2)
    assert(MetadataStore.read(spark, meta).count() == 2)
  }

  test("same-batchId retry is exactly-once: after a crash AND after success") {
    val bronze = Files.createTempDirectory("graft_bronze_retry").toString
    val meta = Files.createTempDirectory("graft_meta_retry").toString + "/store"
    MetadataStore.ingestWithGate(rawPostings(Seq("p1" -> "c1")), bronze, meta, "b1")

    // crash state: b2's attempt started (marker written first), its
    // bronze files landed, but the commit marker never did
    java.nio.file.Files.createFile(java.nio.file.Paths.get(meta, "_attempt_b2"))
    writeRawBatch(bronze, "b2", Seq("p2"))
    assert(BronzeLayer.readRaw(spark, bronze).count() == 2)
    val retried = MetadataStore.ingestWithGate(
      rawPostings(Seq("p2" -> "content-p2")), bronze, meta, "b2")
    assert(retried.count() == 1, "uncommitted leftovers must be cleared and re-ingested")
    val rows = BronzeLayer.readRaw(spark, bronze)
    assert(rows.count() == 2, s"no duplicate from the crashed attempt")
    assert(rows.filter(org.apache.spark.sql.functions.col("batch_id") === "batch_id=b2")
      .count() == 0) // sanity: partition value parses as plain b2

    // retry AFTER full success must not destroy the committed bronze files
    val again = MetadataStore.ingestWithGate(
      rawPostings(Seq("p2" -> "content-p2")), bronze, meta, "b2")
    assert(again.count() == 0)
    assert(BronzeLayer.readRaw(spark, bronze).count() == 2,
      "committed batch must survive a redundant retry untouched")
    assert(MetadataStore.read(spark, meta).count() == 2)
  }

  test("a crash between metadata append and commit marker cannot lose data") {
    val bronze = Files.createTempDirectory("graft_bronze_window").toString
    val meta = Files.createTempDirectory("graft_meta_window").toString + "/store"
    MetadataStore.ingestWithGate(rawPostings(Seq("p1" -> "c1")), bronze, meta, "b1")

    // crash state for b2: attempt marker, bronze files AND the metadata
    // append all landed — only the commit marker is missing. This is the
    // window where the b2 etags used to poison the seen-set forever.
    java.nio.file.Files.createFile(java.nio.file.Paths.get(meta, "_attempt_b2"))
    writeRawBatch(bronze, "b2", Seq("p2"))
    MetadataStore.append(
      BronzeLayer.storageMetadata(rawPostings(Seq("p2" -> "content-p2")), "b2"), meta)

    // the orphaned etags are invisible: only b1's committed row gates
    assert(MetadataStore.read(spark, meta).count() == 1,
      "attempt-without-commit metadata must not be part of the seen-set")

    // same-id retry: leftovers (bronze AND the meta subtree) are cleared,
    // the payload lands exactly once, and the batch commits cleanly
    val retried = MetadataStore.ingestWithGate(
      rawPostings(Seq("p2" -> "content-p2")), bronze, meta, "b2")
    assert(retried.count() == 1,
      "a payload recorded only by the crashed append must still land")
    val rows = BronzeLayer.readRaw(spark, bronze)
    assert(rows.count() == 2)
    assert(rows.select("raw_content").distinct().count() == 2)
    assert(MetadataStore.read(spark, meta).count() == 2)
    assert(MetadataStore.read(spark, meta).select("etag").distinct().count() == 2)
  }
}
