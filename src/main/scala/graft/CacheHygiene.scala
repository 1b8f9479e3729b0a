package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.graft.ColumnBridge

/** Release the storage behind eager `localCheckpoint(true)` frames.
  *
  * A local checkpoint truncates lineage, so its blocks are immortal until
  * explicitly unpersisted — in a long-lived session (a 150-query bench run,
  * a streaming driver running for days) every ingest/Lloyd-pass checkpoint
  * accumulates as an un-collectable cached RDD. Builders that checkpoint
  * intermediates release them as soon as their last consumer has run;
  * frames returned to callers are released by the caller via [[release]]
  * once fully consumed.
  *
  * Root-only on purpose: matching is restricted to a frame whose plan root
  * IS the checkpoint's `LogicalRDD`. Walking the whole tree would also hit
  * checkpoints *embedded* in derived plans (e.g. a projection over a
  * checkpointed edge list) and unpersist frames still in use.
  */
object CacheHygiene {
  /** Unpersist the block-backed RDD behind checkpointed frames. No-op for
    * frames that are not themselves checkpoints. After release the frame
    * must not be read again (lineage is gone — a re-read fails loudly
    * rather than recomputing).
    */
  def release(dfs: DataFrame*): Unit = dfs.foreach { df =>
    ColumnBridge.analyzed(df) match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
