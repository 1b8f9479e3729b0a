package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** The whole curation pipeline, chained over live data — the "a user of
  * the reference could run their entire workload here" demonstration:
  * exact dedup → near-dup closure with quality-aware survivors →
  * √-temperature source rebalance → per-source token budget →
  * curriculum binning → corpus shuffle. Asserts the invariants that make
  * the chain trustworthy end to end: monotone survivor sets, permutation
  * ranks, near-equal curriculum bins, and full determinism under input
  * repartitioning.
  */
class PipelineEndToEndSpec extends SparkSpec {

  private def runChain(docs: DataFrame): (Seq[Long], Seq[Long], Seq[Long], DataFrame) = {
    // 1. exact dedup: one survivor per fingerprint (min id)
    val exact = docs.groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
    val d1 = docs.join(exact.select("doc_id"), "doc_id")

    // 2. near-dup closure, quality-aware survivor per cluster
    val keepers = TextOps.keepBestOn(d1).select(col("keep_id").as("doc_id"))
    val d2 = d1.join(keepers, "doc_id")

    // 3. √-temperature source rebalance at 0.9
    val mixed = TextOps.sqrtTemperatureSample(d2, "source", 0.9)
    val d3 = d2.join(mixed.select("doc_id"), "doc_id")

    // 4. best 800 tokens per source
    val budgeted = TextOps.tokenBudgetSelect(d3, "source", 800L)
    val d4 = d3.join(budgeted.select("doc_id"), "doc_id")

    // 5. curriculum bins over the quality score, then 6. corpus shuffle
    val scored = d4.select(col("doc_id"),
      TextOps.qualityExpr(col("text")).as("quality"))
    val binned = TextOps.curriculumBins(scored, col("quality"), col("doc_id"), 5)
    val ranked = TextOps.shuffleRank(
      binned.select("doc_id", "bin"), col("doc_id"), "e2e:")

    (ids(d2), ids(d3), ids(d4), ranked)
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("full curation chain: monotone survivors, permutation rank, balanced bins, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val n0 = docs.count()
    val (d2, d3, d4, ranked) = runChain(docs)

    // monotone, nonempty, with real attrition by the budget stage
    assert(d2.size <= n0 && d3.size <= d2.size && d4.size <= d3.size)
    assert(d4.nonEmpty, "the chain must not zero out")
    assert(d4.size < n0, "the budget stage must actually select")
    assert(d3.toSet.subsetOf(d2.toSet) && d4.toSet.subsetOf(d3.toSet))

    // near-dup stage dropped the non-keepers the closure found
    val nonKeepers = TextOps.q94DedupComponents(spark, "/root/testdata/sf0.01")
      .filter(!col("is_keeper")).count()
    assert(n0 - d2.size == nonKeepers,
      s"exact stage is lossless on this corpus; near-dup drops $nonKeepers")

    // final ranks are a permutation of 1..n over exactly the survivors
    val rows = ranked.collect()
    assert(rows.length == d4.size)
    assert(rows.map(_.getAs[Long]("shuffle_rank")).sorted
      .sameElements(1L to d4.size.toLong))
    // curriculum bins within one of each other
    val sizes = rows.groupBy(_.getAs[Long]("bin")).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"bin sizes: ${sizes.toSeq.sorted}")

    // the WHOLE chain is partitioning-independent
    val (e2, e3, e4, ranked2) = runChain(docs.repartition(7))
    assert(e2 == d2 && e3 == d3 && e4 == d4)
    val r1 = rows.map(r => (r.getLong(0), r.getAs[Long]("shuffle_rank"))).sorted
    val r2 = ranked2.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shuffle_rank"))).sorted
    assert(r1.sameElements(r2), "shuffle order must not depend on layout")
  }
}
