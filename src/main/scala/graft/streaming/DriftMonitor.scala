package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextOps
import graft.sources.{MetadataStore, ParquetSink}

/** Streaming quality-drift monitor — the continuous form of q92: the
  * reference quality histogram is computed once from a known-good window
  * and persisted; every ingest micro-batch then scores its own
  * distribution against it (PSI per source) and appends a row to a drift
  * table, flagged when PSI crosses the alert threshold. The monitor
  * OBSERVES, it does not gate: a drifted batch still lands in bronze
  * (dropping data on a distribution signal is a human decision), but the
  * drift table makes the break visible the batch it happens — a scraper
  * regression or boilerplate flood shows as a PSI spike per batch, per
  * source, long before any per-row gate trips.
  *
  * Scale: the reference histogram is ≤ groups×bins rows however large the
  * reference window was; per batch the only corpus-sized work is ONE
  * histogram pass over the batch itself ([[TextOps.qualityHistogram]]).
  * The PSI arithmetic ([[TextOps.psiFromHistograms]]) runs on aggregates.
  * Industry reading of the score: <0.1 stable, 0.1–0.25 drifting, >0.25
  * investigate (the default alert threshold).
  *
  * Crash-safety: drift rows are written with dynamic partition overwrite
  * keyed by batch_id, so a foreachBatch replay after a crash REPLACES the
  * batch's rows instead of duplicating them — the drift table stays
  * exactly-once per (batch, source) like the ingest itself.
  */
object DriftMonitor {

  /** Build and persist the reference histogram (overwrite — re-baselining
    * is an explicit operator action). One pass over the reference window;
    * the artifact is ≤ groups×bins rows. The bin COUNT is persisted as a
    * constant column of the artifact: bin indices only mean anything
    * relative to their width, so the artifact must carry its own binning
    * contract — a reader supplying its own count would silently misalign
    * indices from different widths and compute a wrong PSI (r14 advice).
    */
  def writeReference(docs: DataFrame, grp: String, textCol: String,
      refHistPath: String, bins: Int = 10): Unit =
    TextOps.qualityHistogram(docs, grp, textCol, bins)
      .withColumn("bins", lit(bins))
      .coalesce(1).write.mode("overwrite").parquet(refHistPath)

  /** PSI of `batch` against the persisted reference, per group:
    * (grp, n_ref, n_cur, psi). The batch histogram is binned with the
    * count DERIVED from the reference artifact — never caller-supplied,
    * so the two histograms cannot misalign. Fails loudly on a pre-bins
    * artifact (rebuild it with [[writeReference]]) rather than guessing.
    */
  def psiAgainst(spark: SparkSession, refHistPath: String, batch: DataFrame,
      grp: String, textCol: String): DataFrame = {
    val ref = spark.read.parquet(refHistPath)
    require(ref.columns.contains("bins"),
      s"reference histogram at $refHistPath carries no `bins` column; " +
        "rebuild it with DriftMonitor.writeReference — comparing against " +
        "a guessed bin count would silently misalign bin indices")
    // the artifact is ≤ groups×bins rows, so this collect is bounded
    val counts = ref.select(col("bins")).distinct().collect().map(_.getInt(0))
    require(counts.length == 1,
      s"reference histogram at $refHistPath has inconsistent bin counts " +
        s"${counts.toSeq.sorted.mkString(",")} — it was written by mixed " +
        "writeReference runs; rebuild it")
    TextOps.psiFromHistograms(
      ref.drop("bins"),
      TextOps.qualityHistogram(batch, grp, textCol, counts(0)), grp)
  }

  /** One drift row per source for `batch`, (over)written under the
    * batch's `driftPath` partition — the shared tail of
    * [[monitoredIngest]] and [[BronzePipeline.curatedIngest]]. */
  private[streaming] def recordDrift(spark: SparkSession, refHistPath: String,
      batch: DataFrame, driftPath: String, batchId: String,
      threshold: Double): Unit = {
    val drift = psiAgainst(spark, refHistPath, batch,
        "source", "raw_content")
      .withColumn("alert", col("psi") > threshold)
      .withColumn("batch_id", lit(batchId))
    ParquetSink.overwritePartitions(drift, driftPath, Seq("batch_id"))
  }

  /** [[BronzePipeline.gatedIngest]] with the drift monitor riding each
    * micro-batch: rows land through the exact-dedup metadata gate as
    * usual, then the batch's quality distribution is scored against the
    * reference and one drift row per source is (over)written under the
    * batch's partition of `driftPath`.
    */
  def monitoredIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, refHistPath: String,
      driftPath: String, checkpointPath: String,
      threshold: Double = 0.25): StreamingQuery = {
    val pid = BronzePipeline.pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        // one materialization: the gate consumes the batch and the
        // histogram pass would otherwise re-read the staging JSON
        val once = graft.CacheHygiene.materialize(batch.toDF(), "drift batch")
        try {
          graft.CacheHygiene.release(
            MetadataStore.ingestWithGate(once, bronzePath, metaPath, batchId))
          recordDrift(spark, refHistPath, once, driftPath, batchId,
            threshold)
        } finally graft.CacheHygiene.release(once)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
