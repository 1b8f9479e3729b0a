package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{BronzeLayer, MetadataStore}

class MetadataStoreSpec extends SparkSpec {

  private def rawDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, content) => (id, content, "hh", "2024-09-23 11:00:00") }
      .toDF("posting_id", "raw_content", "source", "extracted_at")
      .withColumn("extracted_at", to_timestamp(col("extracted_at")))
  }

  test("gated ingest: re-delivered payloads never land in bronze twice") {
    val bronze = Files.createTempDirectory("graft_bronze_meta").toString
    val meta = Files.createTempDirectory("graft_meta").toString + "/store"

    val acc1 = MetadataStore.ingestWithGate(
      rawDf(Seq("p1" -> "c1", "p2" -> "c2", "p3" -> "c3")), bronze, meta, "b1")
    assert(acc1.count() == 3, "empty store admits everything")
    assert(MetadataStore.read(spark, meta).count() == 3)

    // batch 2 re-delivers c2 under a new posting id + one new payload
    val acc2 = MetadataStore.ingestWithGate(
      rawDf(Seq("p4" -> "c2", "p5" -> "c5")), bronze, meta, "b2")
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
      rawDf(Seq("p4" -> "c2", "p5" -> "c5")), bronze, meta, "b3")
    assert(acc3.count() == 0)
    assert(BronzeLayer.readRaw(spark, bronze).count() == 4)
  }
}
