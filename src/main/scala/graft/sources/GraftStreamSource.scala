package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.types.StructType

/** A manifest table as a Structured Streaming source — the lakehouse
  * CHANGE FEED, streaming-native:
  *
  * {{{
  *   spark.readStream.format("graft").load(table)          // snapshot + tail
  *     .writeStream.option("checkpointLocation", cp)...
  *   spark.readStream.format("graft")
  *     .option("sinceVersion", 5)                           // tail only
  *     .option("maxVersionsPerBatch", 10)                   // admission
  *     .load(table)
  * }}}
  *
  * Design (the Delta-connector shape — a V1 [[Source]], NOT a DSv2
  * `MicroBatchStream`, deliberately): offsets are manifest VERSIONS, and
  * `getBatch(from, to)` plans the appended slice as a normal batch
  * DataFrame over exactly the commits in `(from, to]` — so every batch
  * keeps Spark's native vectorized parquet scan and whole-stage codegen
  * instead of re-implementing a row reader behind a
  * `PartitionReaderFactory`. The version axis makes exactly-once
  * delivery structural: a commit's rows are in a batch iff its version
  * is, offsets checkpoint as plain longs, and restart replays the one
  * uncommitted batch with identical dir contents (manifests are
  * immutable).
  *
  * The batch slice is [[ManifestTable.appendedEntries]], so the stream
  * inherits its contract: a non-append boundary (an overwrite or
  * compaction rewrote dirs inside `(from, to]`) FAILS the stream with
  * the re-bootstrap message rather than double-delivering rewritten
  * rows. Schedule compaction outside streaming windows (the
  * [[ManifestTable.commitIdempotent]] caveat, same root cause), or
  * restart the stream from a fresh checkpoint to re-baseline.
  *
  * The schema is fixed at stream start (streaming plans cannot change
  * shape mid-query): later evolution-appended columns are dropped from
  * the feed, columns the new commits omit null-fill — the slice-read
  * contract. Restart the stream to pick up a wider schema.
  *
  * `sinceVersion` starts the tail after that version (0 = the whole
  * snapshot is the first batch — the bootstrap semantics shared with the
  * batch SQL surface). `maxVersionsPerBatch` caps how many versions one
  * micro-batch admits, bounding batch size under backlog (the
  * maxFilesPerTrigger analog; commits are the admission unit because
  * they are the atomicity unit).
  */
private[graft] final class GraftStreamSource(spark: SparkSession,
    path: String, override val schema: StructType, sinceVersion: Long,
    maxVersionsPerBatch: Option[Long], metadataPath: String) extends Source {

  // The newest version this source has ever OFFERED as an offset — the
  // admission cap advances from here. It must SURVIVE RESTARTS: a fresh
  // instance that reset to sinceVersion would, under maxVersionsPerBatch,
  // offer an offset BELOW the checkpointed one (offered+cap < committed
  // end), and Spark treats any available != committed as a new batch —
  // getBatch(committed, lower) — which can only fail. V1 sources are
  // DENIED AcceptsLatestSeenOffset (asserted at query start), so the
  // sanctioned pattern is source-private state under metadataPath, which
  // lives inside the checkpoint and travels with it (the V1
  // Kafka/File-source arrangement). getBatch still fast-forwards for the
  // uncommitted-replay path.
  private val offeredFile = new org.apache.hadoop.fs.Path(
    metadataPath, "graft-offered")
  private def hfs = offeredFile.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def persistOffered(v: Long): Unit = {
    // tmp + ONE overwriting rename (FileContext OVERWRITE — atomic on
    // HDFS and local), so the published file is never torn AND never
    // absent. The delete-then-rename pair this replaces left a crash
    // window with no state file at all; under maxVersionsPerBatch a
    // restart inside that window re-seeds sinceVersion and the next
    // offered offset lands BELOW the checkpointed end — 'offsets went
    // backward', a dead checkpoint. Single-writer file (this source owns
    // it), so the rename cannot race another publisher.
    val tmp = new org.apache.hadoop.fs.Path(metadataPath,
      s"graft-offered.tmp-${java.util.UUID.randomUUID()}")
    val out = hfs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(offeredFile.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, offeredFile, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The persisted high-water mark, with the torn-pair retry discipline
    * [[RenameCommitStore.read]] uses: on the local fs an overwriting
    * rename moves the data file and its .crc sidecar as two ops, so a
    * reader can catch a transient unreadable window. That window must
    * NOT be mistaken for absent state — the constructor would re-seed
    * sinceVersion OVER the live value, manufacturing exactly the
    * backward-offsets dead checkpoint this file exists to prevent.
    * None only when the file genuinely does not exist; an existing but
    * persistently unreadable/garbage file throws loudly instead.
    */
  private def readOffered(): Option[Long] = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < 6) {
      if (!hfs.exists(offeredFile)) return None
      try {
        val in = hfs.open(offeredFile)
        val s = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim
        finally in.close()
        return Some(s.toLong)
      } catch {
        case e @ (_: java.io.IOException | _: NumberFormatException) =>
          last = e
          attempt += 1
          Thread.sleep(math.min(40L, 4L << attempt))
      }
    }
    throw new IllegalStateException(
      s"graft stream: offset state $offeredFile exists but stayed " +
        "unreadable after retries - refusing to re-seed sinceVersion " +
        "over live state (that would be a backward-offsets dead " +
        "checkpoint); inspect or remove the file to proceed", last)
  }

  private var offered: Long = readOffered() match {
    case Some(v) => math.max(sinceVersion, v)
    case None => persistOffered(sinceVersion); sinceVersion
  }

  override def getOffset: Option[Offset] = synchronized {
    val head = math.max(offered, ManifestTable.currentVersion(spark, path))
    val admitted = maxVersionsPerBatch match {
      case Some(m) => math.min(head, offered + m)
      case None => head
    }
    if (admitted > offered) { persistOffered(admitted); offered = admitted }
    if (offered > sinceVersion) Some(StreamBridge.longOffset(offered)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(StreamBridge.offsetValue).getOrElse(sinceVersion)
    val to = StreamBridge.offsetValue(end)
    require(from <= to,
      s"graft stream: offsets went backward ($from -> $to) - the source's " +
        s"offset state under $metadataPath was lost; restart from a fresh " +
        "checkpoint")
    synchronized { // uncommitted-batch replay on restart
      if (to > offered) { persistOffered(to); offered = to }
    }
    // the appended slice, planned as a batch read (pruned dirs, full
    // native scan), re-tagged streaming for MicroBatchExecution
    val entries = ManifestTable.appendedEntries(spark, path, from, to)._2
    val batch = ManifestTable.sliceReadAs(spark, path,
      entries.map(_.dir).sorted, schema)
    StreamBridge.streamingDataFrame(spark, batch)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$path since v$sinceVersion]"
}
