package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.BronzeLayer

/** End-to-end incremental bronze → silver pipeline: the reference's daily
  * Airflow pull + transform (finnoio/jobhouse dags/extract_raw_jobs.py)
  * as one Structured Streaming flow. Each scheduled invocation of
  * [[runOnce]] drains every new bronze batch exactly once —
  * `Trigger.AvailableNow` + the file-source checkpoint replace the DAG's
  * catchup/bookkeeping (the batch-mode equivalent is
  * `graft.sources.BatchRunner`), and a killed run resumes from the
  * checkpoint without reprocessing or loss.
  *
  * Silver = typed/derived fields over the raw payload; heavyweight
  * cleaning stays in `operators.Lifecycle`, which reads this output.
  */
object BronzePipeline {

  /** The silver projection of the streaming bronze tail. */
  def silverStream(spark: SparkSession, bronzePath: String): DataFrame =
    BronzeLayer.readRawStream(spark, bronzePath)
      .withColumn("etag", md5(col("raw_content")))
      .withColumn("content_chars", length(col("raw_content")).cast("long"))
      .withColumn("extracted_date", to_date(col("extracted_at")))

  /** Drain all currently-available bronze batches into silver parquet and
    * stop. Exactly-once across invocations/crashes via the checkpoint.
    */
  def runOnce(spark: SparkSession, bronzePath: String, silverPath: String,
      checkpointPath: String): StreamingQuery =
    silverStream(spark, bronzePath).writeStream
      .format("parquet")
      .option("path", silverPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
