package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Cumulative vocabulary-growth monitor on the KMV sketch — the
  * Heaps-law curve of an ingest pipeline with O(k) state: after each
  * micro-batch, the persisted sketch is the k smallest distinct
  * trigram hashes EVER ingested, so the cumulative distinct-vocabulary
  * estimate (and its per-batch growth) costs k longs however many
  * trillions of grams have flowed past. Growth ≈ 0 while volume keeps
  * arriving is the "re-crawling the same content" signal a freshness
  * dashboard alerts on — the complement of the per-batch dedup gates
  * (those answer "is THIS doc a copy"; this answers "is the STREAM
  * still teaching us anything").
  *
  * Determinism inherits from [[graft.plans.KmvSketch]]: the store is a
  * pure function of the set of grams ingested, independent of batch
  * boundaries — replaying the same history in different micro-batch
  * splits converges to the identical sketch (spec-pinned), so the
  * monitor never needs exactly-once bookkeeping to stay CORRECT about
  * the cumulative estimate (a replayed batch merges to a no-op).
  *
  * k is STAMPED inside the store artifact and derived at read time —
  * minima kept at different k are not comparable (the DriftMonitor
  * bins lesson). The estimator is the q135 one: (k−1)·2³²/v_k, exact
  * while the sketch is not yet full.
  */
object VocabMonitor {

  /** Ingest one batch: merge its gram minima into the persisted sketch,
    * append a growth row to the log, return that row —
    * (batch_id, est_batch, est_before, est_after, est_growth).
    * `k` is only consulted when CREATING the store; afterwards the
    * stamped value governs and the parameter must match it.
    */
  def record(batch: DataFrame, storePath: String, logPath: String,
      batchId: String, k: Int = 1024, textCol: String = "text"): DataFrame = {
    require(k >= 2, s"VocabMonitor: k must be >= 2, got $k")
    val spark = batch.sparkSession
    import spark.implicits._
    val pr = prior(spark, storePath)
    val (kk, before) = pr.getOrElse((k, Array.empty[Long]))
    require(kk == k,
      s"VocabMonitor: store at $storePath was built at k=$kk; minima " +
        s"kept at k=$k are not comparable — pass k=$kk or rebuild")
    val sk = batch
      .select(explode(graft.plans.GraftFunctions.shingles(
        TextOps.tokens(col(textCol)), 3)).as("g"))
      .agg(graft.plans.GraftFunctions.kmv_sketch(
        TextOps.hashKey(col("g")), kk).as("s"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    val after = (before ++ sk).distinct.sorted.take(kk)
    Seq((kk, after.toSeq)).toDF("k", "sketch")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(storePath)
    val row = Seq((batchId, estimate(kk, sk), estimate(kk, before),
      estimate(kk, after), estimate(kk, after) - estimate(kk, before)))
      .toDF("batch_id", "est_batch", "est_before", "est_after", "est_growth")
    row.write.mode(SaveMode.Append).parquet(logPath)
    row
  }

  /** The persisted (k, minima) — None before the first batch. */
  private def prior(spark: SparkSession,
      storePath: String): Option[(Int, Array[Long])] = {
    val p = new Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(storePath).collect()(0)
      Some((r.getInt(0), r.getAs[scala.collection.Seq[Long]](1).toArray))
    }
  }

  /** The q135 KMV estimator: exact while the sketch is not full. */
  private def estimate(k: Int, minima: Array[Long]): Long =
    if (minima.length < k) minima.length.toLong
    else math.floor((k - 1).toDouble * 4294967296.0 / minima.last).toLong
}
