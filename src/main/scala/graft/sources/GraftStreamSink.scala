package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.streaming.OutputMode

/** A manifest table as a Structured Streaming SINK — the write half of
  * the streaming lakehouse loop ([[GraftStreamSource]] is the read
  * half):
  *
  * {{{
  *   stream.writeStream.format("graft")
  *     .option("path", table).option("checkpointLocation", cp)
  *     .outputMode("append").start()
  * }}}
  *
  * **Append mode** lands each micro-batch through
  * [[ManifestTable.commitIdempotent]] with token
  * `<queryId>-<batchId>` — the query id is stable across restarts from
  * one checkpoint (unlike the per-run runId), so a replayed batch after
  * a crash finds its token in the head snapshot and no-ops: exactly-once
  * is the token ledger's contract, not a sink-side dedup. Two DIFFERENT
  * queries streaming into one table get different query ids and
  * interleave safely through the commit CAS.
  *
  * **Complete mode** (aggregation streams) commits each batch as the
  * whole-snapshot overwrite it semantically is — the table IS the
  * current aggregate state, and a replayed overwrite rewrites the same
  * deterministic content (last-writer-wins, the [[ManifestTable.commit]]
  * overwrite contract). Update mode is refused: a partial-update batch
  * has no commit form (it would need row-level merge, which is
  * [[graft.operators.Lifecycle.cdcApply]]'s job, not a sink's).
  *
  * The first batch births an unborn table (commit against version 0);
  * schema drift across restarts fails at the commit's own append-schema
  * check, loudly. New commits record stats on the head's stats columns
  * (inheritance, as everywhere on the SQL surface) or the `stats`
  * option's. Empty batches commit empty versions (the token ledger keeps
  * exactly-once bookkeeping uniform; compaction reclaims them).
  *
  * This is `BronzePipeline.runOnceToTable`'s foreachBatch contract
  * promoted to a declarative `writeStream.format` — same idempotence
  * mechanism, no user-written batch closure.
  */
private[graft] final class GraftStreamSink(spark: SparkSession,
    path: String, mode: OutputMode, statsOpt: Option[Seq[String]])
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the micro-batch arrives streaming-tagged; re-wrap the same planned
    // rows as a batch frame (no collect, consumed exactly once by the
    // commit's parquet write)
    val batch = StreamBridge.batchDataFrame(spark, data)
    val stats = statsOpt.getOrElse(ManifestTable.headStatsCols(spark, path))
    if (mode == OutputMode.Complete())
      ManifestTable.commit(batch, path, append = false, statsCols = stats)
    else {
      val queryId = StreamBridge.activeQueryId(spark).getOrElse(
        throw new IllegalStateException(
          "graft sink: no active streaming query id to key idempotence on"))
      ManifestTable.commitIdempotent(batch, path, s"$queryId-$batchId",
        statsCols = stats)
    }
    ()
  }

  override def toString: String = s"GraftStreamSink[$path, $mode]"
}
