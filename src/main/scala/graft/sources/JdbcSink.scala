package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** Serving-layer JDBC batch loader — the analog of the reference's
  * S3 → Postgres COPY load task (finnoio/jobhouse
  * dags/extract_raw_jobs.py:204-248, `cursor.copy_expert`): marts land in
  * a serving database in batched, idempotent loads.
  *
  * Shape for scale: the DELETE phase runs once on the driver (partition
  * values are a small set by definition — that is what makes them
  * partitions), then every Spark partition streams its rows through one
  * connection with `addBatch`/`executeBatch` COPY-style batching, so a
  * 1000-executor load fans out to 1000 parallel bulk inserts. Re-running
  * a load of the same partitions first deletes what it is about to
  * rewrite — overwrite-by-partition idempotence, the same contract as a
  * parquet dynamic-partition overwrite. Concurrent loads of the SAME
  * partition are excluded by contract (the reference serializes runs via
  * max_active_runs=1; BatchRunner's ledger does the equivalent here).
  */
object JdbcSink {

  /** rows inserted / JDBC batches executed — spec-observable so batching
    * is testable, and a load report for ops. */
  case class WriteStats(rows: Long, batches: Long)

  def writePartitioned(dfIn: DataFrame, url: String, table: String,
      partitionCol: String, batchSize: Int = 500): WriteStats = {
    require(batchSize > 0)
    // materialize once: the partition scan and the insert scan MUST see
    // the same rows (a nondeterministic df recomputed per phase would
    // desync the deleted vs inserted partition sets), and an expensive
    // mart should not compute twice. persist (not localCheckpoint) keeps
    // lineage, so a lost executor re-computes its blocks instead of
    // failing the load; released in the finally below so repeated loads
    // in one session don't accumulate blocks.
    val df = dfIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cols = df.schema.fieldNames
      val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"

      // phase 1 (driver, one transaction): clear the partitions being loaded
      val parts = df.select(partitionCol).distinct().collect().map(_.get(0))
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val del = conn.prepareStatement(s"DELETE FROM $table WHERE $partitionCol = ?")
        parts.filter(_ != null).foreach { v => del.setObject(1, v); del.addBatch() }
        del.executeBatch()
        // 'col = NULL' never matches in SQL three-valued logic: the null
        // partition needs its own IS NULL delete or reloads would duplicate
        if (parts.contains(null))
          conn.createStatement().execute(
            s"DELETE FROM $table WHERE $partitionCol IS NULL")
        conn.commit()
        del.close()
      } finally conn.close()

      // phase 2 (executors): batched inserts, one connection per partition
      val rowsAcc = df.sparkSession.sparkContext.longAccumulator("jdbc_sink_rows")
      val batchAcc = df.sparkSession.sparkContext.longAccumulator("jdbc_sink_batches")
      val nCols = cols.length
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val c = DriverManager.getConnection(url)
          try {
            c.setAutoCommit(false)
            val ps = c.prepareStatement(insertSql)
            var pending = 0
            it.foreach { r =>
              var i = 0
              while (i < nCols) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
              pending += 1
              rowsAcc.add(1)
              if (pending == batchSize) { ps.executeBatch(); batchAcc.add(1); pending = 0 }
            }
            if (pending > 0) { ps.executeBatch(); batchAcc.add(1) }
            c.commit()
            ps.close()
          } finally c.close()
        }
      }
      WriteStats(rowsAcc.value, batchAcc.value)
    } finally df.unpersist(blocking = false)
  }
}
