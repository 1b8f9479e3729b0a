package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.BronzeLayer
import graft.streaming.MixtureGate

class MixtureGateSpec extends SparkSpec {

  test("streaming mixture: persisted rates flatten the dominant source, admit rare and novel whole, batch-composition-independent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mixgate").toString
    val staging = s"$root/staging"
    val bronze = s"$root/bronze"
    val meta = s"$root/meta"
    val rates = s"$root/rates"
    val checkpoint = s"$root/ckpt"

    // reference window: 900 "big" / 100 "small" -> rate_big 0.416667,
    // rate_small capped at 1.0 (the q89 spec's planted skew)
    val reference = ((1 to 900).map(i => (i.toLong, s"big body $i", "big")) ++
      (1 to 100).map(i => (10000L + i, s"small body $i", "small")))
      .toDF("doc_id", "text", "source")
    MixtureGate.writeRates(reference, "source", 0.5, rates)
    val r = spark.read.parquet(rates).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("big" -> 0.416667, "small" -> 1.0))

    // one mixed batch: 200 new big docs, 30 small, 10 from a NOVEL source
    val bigRows = (1 to 200).map(i => s"nb$i" -> s"new big content $i")
    val smallRows = (1 to 30).map(i => s"ns$i" -> s"new small content $i")
    val novelRows = (1 to 10).map(i => s"nv$i" -> s"novel source content $i")
    def post(rows: Seq[(String, String)], src: String) =
      rawPostings(rows).withColumn("source", lit(src))
    val batch = post(bigRows, "big")
      .union(post(smallRows, "small")).union(post(novelRows, "fresh-crawl"))
    batch.coalesce(1).write.mode("append").json(staging)

    MixtureGate.gatedIngest(spark, staging, bronze, meta, rates, checkpoint)
      .awaitTermination()
    val landed = BronzeLayer.readRaw(spark, bronze)
    val bySrc = landed.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

    // rare + unknown sources land whole; dominant source flattens
    assert(bySrc("small") == 30L, s"rate-1.0 source must land whole: $bySrc")
    assert(bySrc("fresh-crawl") == 10L, s"novel source admits everything: $bySrc")
    assert(bySrc("big") > 40 && bySrc("big") < 130,
      s"big at rate 0.417 of 200 should land ~83: $bySrc")

    // batch-composition independence: the streaming admit set for "big"
    // equals the batch-mode filter applied to those docs alone
    val expected = post(bigRows, "big")
      .filter(TextOps.mixtureKeep(col("raw_content"), lit(0.416667)))
      .select("posting_id").collect().map(_.getString(0)).toSet
    val got = landed.filter(col("source") === "big")
      .select("posting_id").collect().map(_.getString(0)).toSet
    assert(got == expected,
      "the admit decision must not depend on what else was in the batch")
  }
}
