package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.UUID

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** Serving-layer JDBC batch loader — the analog of the reference's
  * S3 → Postgres COPY load task (finnoio/jobhouse
  * dags/extract_raw_jobs.py:204-248, `cursor.copy_expert`): marts land in
  * a serving database in batched, idempotent loads.
  *
  * Shape for scale: every Spark partition streams its rows into a
  * staging table through one connection with `addBatch`/`executeBatch`
  * COPY-style batching, so a 1000-executor load fans out to 1000
  * parallel bulk inserts; the target table is then rewritten in ONE
  * driver transaction (delete the loaded partitions + insert-select from
  * staging). Because only that final transaction touches the target, the
  * load is exactly-once end-to-end, not just at-least-once per task:
  *   - a task retry (fetch-failure stage retry, executor loss) first
  *     deletes its own staged slice, keyed by Spark partition id;
  *   - concurrent speculative attempts may both commit to staging, but
  *     the merge keeps only the highest task-attempt id per partition;
  *   - a crash anywhere before the final commit leaves the target
  *     untouched, and re-running the load rebuilds staging from scratch.
  * Re-running a load of the same partitions first deletes what it is
  * about to rewrite — overwrite-by-partition idempotence, the same
  * contract as a parquet dynamic-partition overwrite. The staging table
  * is named uniquely per load, so concurrent loads of DIFFERENT
  * partitions of one table cannot clobber each other's staging;
  * concurrent loads of the SAME partition remain excluded by contract
  * (the reference serializes runs via max_active_runs=1; BatchRunner's
  * ledger does the equivalent here). The stage is dropped on every
  * normal or failed completion; only a hard JVM kill can leak one, and
  * any `<table>_gstg_*` leftover is safe to drop manually.
  */
object JdbcSink {

  /** rows merged into the target / JDBC batches the winning attempts
    * executed while staging — spec-observable so batching is testable,
    * and a load report for ops. */
  case class WriteStats(rows: Long, batches: Long)

  private val Ident = "[A-Za-z][A-Za-z0-9_]*"

  def writePartitioned(df: DataFrame, url: String, table: String,
      partitionCol: String, batchSize: Int = 500): WriteStats = {
    require(batchSize > 0)
    // every name below is spliced into SQL text — keep them plain identifiers
    require(table.matches(Ident), s"table must match $Ident, got '$table'")
    val cols = df.schema.fieldNames
    (partitionCol +: cols).foreach(c =>
      require(c.matches(Ident), s"column must match $Ident, got '$c'"))
    // unique per load: concurrent loads of one table each stage privately
    val stage = s"${table}_gstg_${UUID.randomUUID().toString.replace("-", "").take(12)}"
    val colList = cols.mkString(", ")

    // phase 0 (driver): create staging as a constraint-free schema clone
    // of the target plus the task-identity columns the retry/speculation
    // story needs
    withConn(url) { c =>
      exec(c, s"CREATE TABLE $stage AS SELECT $colList FROM $table WITH NO DATA")
      exec(c, s"ALTER TABLE $stage ADD COLUMN gstg_part INTEGER")
      exec(c, s"ALTER TABLE $stage ADD COLUMN gstg_att BIGINT")
    }
    try {
      // phase 1 (executors): each task stages its rows in one transaction,
      // tagged (partitionId, taskAttemptId); delete-before-insert on the
      // partition id makes a retried task idempotent in staging.
      val insertSql = s"INSERT INTO $stage ($colList, gstg_part, gstg_att) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}, ?, ?)"
      val nCols = cols.length
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = TaskContext.get()
          val part = tc.partitionId()
          val att = tc.taskAttemptId()
          val c = DriverManager.getConnection(url)
          try {
            c.setAutoCommit(false)
            val del = c.prepareStatement(s"DELETE FROM $stage WHERE gstg_part = ?")
            del.setInt(1, part); del.executeUpdate(); del.close()
            val ps = c.prepareStatement(insertSql)
            var pending = 0
            it.foreach { r =>
              var i = 0
              while (i < nCols) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.setInt(nCols + 1, part)
              ps.setLong(nCols + 2, att)
              ps.addBatch()
              pending += 1
              if (pending == batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            c.commit()
            ps.close()
          } finally c.close()
        }
      }
      mergeStage(url, table, stage, partitionCol, cols, batchSize)
    } finally withConn(url)(dropIfExists(_, stage))
  }

  /** Phase 2 (driver, ONE transaction): overwrite the staged partitions.
    * `winners` keeps exactly one committed attempt per Spark partition
    * (the one with the highest globally-unique task-attempt id), so even
    * a speculative duplicate that raced its sibling to commit cannot
    * double rows in the target. Stats derive from the winning rows alone
    * (batches = Σ ceil(winner-partition rows / batchSize)), so retried or
    * losing attempts never skew the load report.
    */
  private[graft] def mergeStage(url: String, table: String, stage: String,
      partitionCol: String, cols: Seq[String], batchSize: Int = 500): WriteStats = {
    val colList = cols.mkString(", ")
    val winners = s"SELECT gstg_part wp, MAX(gstg_att) wa FROM $stage GROUP BY gstg_part"
    val merged = s"$stage s JOIN ($winners) w ON s.gstg_part = w.wp AND s.gstg_att = w.wa"
    withConn(url) { c =>
      c.setAutoCommit(false)
      val rs = c.createStatement().executeQuery(
        s"SELECT DISTINCT s.$partitionCol FROM $merged")
      val loaded = Iterator.continually(rs).takeWhile(_.next()).map(_.getObject(1)).toVector
      rs.close()
      val brs = c.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM $merged GROUP BY s.gstg_part")
      val batches = Iterator.continually(brs).takeWhile(_.next())
        .map(r => (r.getLong(1) + batchSize - 1) / batchSize).sum
      brs.close()
      val del = c.prepareStatement(s"DELETE FROM $table WHERE $partitionCol = ?")
      loaded.filter(_ != null).foreach { v => del.setObject(1, v); del.addBatch() }
      del.executeBatch(); del.close()
      // 'col = NULL' never matches in SQL three-valued logic: the null
      // partition needs its own IS NULL delete or reloads would duplicate
      if (loaded.contains(null))
        exec(c, s"DELETE FROM $table WHERE $partitionCol IS NULL")
      val rows = c.createStatement().executeUpdate(
        s"INSERT INTO $table ($colList) SELECT ${cols.map("s." + _).mkString(", ")} FROM $merged")
      c.commit()
      WriteStats(rows.toLong, batches)
    }
  }

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement()
    try st.execute(sql) finally st.close()
  }

  /** Metadata-probe drop (no reliance on vendor-specific SQLSTATEs).
    * `getTables` patterns treat '_' as a single-char wildcard — escape it
    * so a similarly-shaped sibling table can't fake a match. */
  private def dropIfExists(c: Connection, table: String): Unit = {
    val md = c.getMetaData
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    def pat(t: String) = t.replace("_", s"${esc}_")
    val exists = Seq(table, table.toUpperCase, table.toLowerCase).exists { t =>
      val rs = md.getTables(null, null, pat(t), null)
      try rs.next() finally rs.close()
    }
    if (exists) exec(c, s"DROP TABLE $table")
  }
}
