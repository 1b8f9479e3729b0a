package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextOps
import graft.sources.MetadataStore

/** Streaming √-temperature source rebalance — q89 at the ingest edge:
  * keep-rates are computed ONCE from a reference window
  * ([[TextOps.sqrtTemperatureRates]]) and persisted; every micro-batch
  * then applies them as a pure codegen'd filter before the dedup gate.
  * The firehose-downsampling pattern: dominant sources flatten at the
  * door, rare sources land whole, and because the admit decision is the
  * salted content-hash contract ([[TextOps.mixtureKeep]]) it is
  * independent of batch composition — a document admits or not
  * identically whether it arrives alone, in a mixed batch, or in the
  * batch-mode q89 run over the same corpus.
  *
  * Policy for sources ABSENT from the rates table: admit everything
  * (rate 1.0). A brand-new source is a signal ([[DriftMonitor]] spikes
  * on it), not something to silently sample before anyone decided its
  * rate. Re-baseline by re-running [[writeRates]] — an explicit operator
  * action, like the drift reference.
  */
object MixtureGate {

  /** Compute and persist the per-group keep-rates from a reference
    * window (overwrite). The artifact is one row per group. */
  def writeRates(reference: DataFrame, grp: String, targetFrac: Double,
      ratesPath: String): Unit =
    TextOps.sqrtTemperatureRates(reference, grp, targetFrac)
      .coalesce(1).write.mode("overwrite").parquet(ratesPath)

  /** Apply persisted rates to one frame (the per-batch core; also usable
    * in batch jobs that want reference-pinned rather than in-plan rates). */
  def applyRates(spark: SparkSession, ratesPath: String, batch: DataFrame,
      grp: String, textCol: String): DataFrame = {
    val rates = spark.read.parquet(ratesPath)
    // null text hashes to null, which a bare filter would silently DROP
    // regardless of keep_rate — even for sources the gate promises to
    // admit whole. A mixture gate has no opinion about malformed rows:
    // admit them (coalesce → true) and let the pipeline's validation /
    // dedup stages route them loudly (curatedIngest's fingerprint stage
    // drops them with an explicit contract; validatedGatedIngest
    // quarantines them).
    batch.join(broadcast(rates), Seq(grp), "left")
      .filter(coalesce(TextOps.mixtureKeep(col(textCol),
        coalesce(col("keep_rate"), lit(1.0))), lit(true)))
      .drop("keep_rate")
  }

  /** [[BronzePipeline.gatedIngest]] with the mixture filter in front:
    * micro-batches downsample by the persisted rates, survivors ride the
    * exact-dedup metadata gate to bronze. */
  def gatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, ratesPath: String,
      checkpointPath: String, grp: String = "source",
      textCol: String = "raw_content"): StreamingQuery = {
    val pid = BronzePipeline.pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sampled = applyRates(spark, ratesPath, batch.toDF(), grp, textCol)
        graft.CacheHygiene.release(
          MetadataStore.ingestWithGate(sampled, bronzePath, metaPath, f"$pid-$id%05d"))
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
