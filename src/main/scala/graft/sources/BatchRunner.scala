package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Incremental batch runner: the reference DAG's schedule / retries /
  * catchup semantics (finnoio/jobhouse dags/extract_raw_jobs.py:50-67 —
  * `@daily`, `retries=3`, `catchup=False`, `max_active_runs=1`)
  * re-expressed as processed-batch bookkeeping over bronze batch
  * directories:
  *
  *  - discovery = filesystem listing of `batch_id=` partitions (no data
  *    scan), so "catchup" is simply: every unprocessed batch gets run,
  *    oldest first;
  *  - per-batch retries with the job re-invoked from scratch;
  *  - a `<batch>.done` ledger marker written only AFTER the job
  *    succeeds — crash mid-batch leaves no marker, so the next run
  *    resumes exactly there. Batches process effectively-once given
  *    idempotent jobs (the same contract Airflow gives retried tasks);
  *  - one runner per ledger directory by contract = `max_active_runs=1`.
  */
object BatchRunner {

  case class RunReport(processed: Seq[String], skipped: Seq[String],
      failed: Seq[String])

  /** Batch ids present in the bronze zone, oldest-first (ids sort by
    * time when they embed it; otherwise lexicographic = deterministic).
    */
  def listBatches(spark: SparkSession, bronzePath: String): Seq[String] = {
    val root = new Path(bronzePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.globStatus(new Path(bronzePath, "*/*/*/*/*/batch_id=*"))
      .map(_.getPath.getName.stripPrefix("batch_id="))
      .distinct.sorted.toSeq
  }

  /** Batch ids with a completion marker in the ledger. */
  def processedBatches(spark: SparkSession, ledgerDir: String): Set[String] = {
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
  }

  /** Run `job` over every unprocessed batch. The job receives the batch
    * id and that batch's partition-pruned bronze frame.
    */
  def run(spark: SparkSession, bronzePath: String, ledgerDir: String,
      retries: Int = 3)(job: (String, DataFrame) => Unit): RunReport = {
    val ledger = new Path(ledgerDir)
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(ledger)
    val done = processedBatches(spark, ledgerDir)
    val processed = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    val failed = Seq.newBuilder[String]
    listBatches(spark, bronzePath).foreach { b =>
      if (done.contains(b)) skipped += b
      else {
        var attempt = 0
        var ok = false
        var lastErr: Throwable = null
        while (!ok && attempt <= retries) {
          attempt += 1
          try {
            job(b, BronzeLayer.readRaw(spark, bronzePath)
              .filter(col("batch_id") === b))
            ok = true
          } catch {
            // NonFatal only: an OOM/interrupt must not burn retries in a
            // broken JVM or swallow a cancellation
            case scala.util.control.NonFatal(e) => lastErr = e
          }
        }
        if (ok) {
          val out = fs.create(new Path(ledger, s"$b.done"), true)
          out.write(
            s"""{"batch_id":"$b","attempts":$attempt,"completed_at":"${java.time.Instant.now()}"}"""
              .getBytes(StandardCharsets.UTF_8))
          out.close()
          processed += b
        } else {
          System.err.println(s"[batch-runner] $b failed after $attempt attempts:")
          lastErr.printStackTrace()
          failed += b
        }
      }
    }
    RunReport(processed.result(), skipped.result(), failed.result())
  }
}
