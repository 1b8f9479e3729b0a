package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.BronzeLayer

class BronzeLayerSpec extends SparkSpec {

  private def sampleBatch = {
    import spark.implicits._
    Seq(
      ("p1", """{"title":"data engineer","salary":100}""", "HH",
        Timestamp.valueOf("2024-09-23 10:15:00")),
      ("p2", """{"title":"ml engineer","salary":120}""", "HH",
        Timestamp.valueOf("2024-09-23 11:30:00")),
      ("p3", """{"title":"analyst"}""", "LINKEDIN",
        Timestamp.valueOf("2024-09-24 08:00:00")),
    ).toDF("posting_id", "raw_content", "source", "extracted_at")
  }

  test("raw batch round-trips through gzipped JSONL with partition keys") {
    val dir = Files.createTempDirectory("bronze").toString
    BronzeLayer.writeRaw(sampleBatch, dir, "batch_001")
    val back = BronzeLayer.readRaw(spark, dir)
    assert(back.count() == 3)
    val p1 = back.filter(col("posting_id") === "p1").collect().head
    assert(p1.getAs[String]("raw_content").contains("data engineer"))
    assert(p1.getAs[String]("p_source") == "HH")
    assert(p1.getAs[String]("y") == "2024" && p1.getAs[String]("h") == "10")
    // partition layout matches the reference's source/Y/M/D/H/batch scheme
    assert(new java.io.File(
      s"$dir/p_source=HH/y=2024/m=09/d=23/h=10/batch_id=batch_001").exists())
    // files are actually gzip
    val part = new java.io.File(s"$dir/p_source=HH/y=2024/m=09/d=23/h=10/batch_id=batch_001")
      .listFiles().filter(_.getName.endsWith(".gz"))
    assert(part.nonEmpty)
  }

  test("partition pruning reaches the file listing for source+time predicates") {
    val dir = Files.createTempDirectory("bronze").toString
    BronzeLayer.writeRaw(sampleBatch, dir, "batch_001")
    val pruned = BronzeLayer.readRaw(spark, dir)
      .filter(col("p_source") === "HH" && col("d") === "23")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length <= 2)
  }

  test("bronze zone tails as a structured stream (incremental ingest)") {
    val dir = Files.createTempDirectory("bronze").toString
    BronzeLayer.writeRaw(sampleBatch, dir, "batch_001")
    val q = BronzeLayer.readRawStream(spark, dir)
      .writeStream.format("memory").queryName("bronze_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("bronze_tail").count() == 3)
      // a new batch landing in the zone becomes the next micro-batch
      BronzeLayer.writeRaw(sampleBatch.limit(1), dir, "batch_002")
      q.processAllAvailable()
      val rows = spark.table("bronze_tail")
      assert(rows.count() == 4)
      assert(rows.filter(col("batch_id") === "batch_002").count() == 1)
    } finally q.stop()
  }

  test("storage metadata derives the reference's s3 key + etag") {
    val meta = BronzeLayer.storageMetadata(sampleBatch, "batch_001").collect()
    val m1 = meta.find(_.getAs[String]("etag") != null).get
    assert(meta.length == 3)
    val k = meta.map(_.getAs[String]("s3_key")).toSet
    assert(k.contains("HH/2024/09/23/10/batch_001.jsonl.gz"))
    assert(k.contains("LINKEDIN/2024/09/24/08/batch_001.jsonl.gz"))
    assert(m1.getAs[String]("etag").length == 32)
  }
}
