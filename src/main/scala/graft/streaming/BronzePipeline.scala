package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{BronzeLayer, ManifestTable, MetadataStore}

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

  /** The staging-zone row schema every ingest surface binds. ONE
    * definition: the literal used to be copy-pasted across six
    * readStream sites, where adding a column and missing one copy would
    * silently null it in that single ingest path.
    */
  private[streaming] val StagingSchema =
    "posting_id STRING, raw_content STRING, source STRING, extracted_at TIMESTAMP"

  /** The staging readStream every ingest variant tails. */
  private[streaming] def stagingStream(spark: SparkSession,
      path: String): DataFrame =
    spark.readStream.schema(StagingSchema).json(path)

  /** The silver projection of the streaming bronze tail. */
  def silverStream(spark: SparkSession, bronzePath: String): DataFrame =
    BronzeLayer.readRawStream(spark, bronzePath)
      .withColumn("etag", md5(col("raw_content")))
      .withColumn("content_chars", length(col("raw_content")).cast("long"))
      .withColumn("extracted_date", to_date(col("extracted_at")))

  /** Streaming gated ingest: tail a landing zone of raw JSONL drops and
    * route every micro-batch through `MetadataStore.ingestWithGate`, so
    * re-delivered payloads are dropped against the PERSISTENT seen-set —
    * unlike `EventsStream.dedupStream`, whose in-stream state only spans
    * the watermark horizon. The checkpoint makes each landing file
    * process exactly once; the etag gate makes same-content re-drops
    * (new files, old payloads) land nowhere. This is the full reference
    * ingest edge (extract → dedup check → bronze + metadata) as one
    * incremental flow.
    *
    * Batch ids are namespaced by a per-checkpoint pipeline id: micro-batch
    * ids alone restart at 0 whenever the checkpoint is deleted/rebuilt,
    * and a bare `stream-00000` would collide with the previous
    * checkpoint's commit marker — the gate would treat the fresh
    * micro-batch as already committed and silently drop its rows.
    */
  def gatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String,
      checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val fresh = MetadataStore.ingestWithGate(batch.toDF(), bronzePath, metaPath, f"$pid-$id%05d")
        // the ingest's internal writes were the frame's only consumers here
        graft.CacheHygiene.release(fresh)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[gatedIngest]] with the reference's model validation in front
    * (finnoio/jobhouse src/common/data.py RawJobPosting): each
    * micro-batch splits on [[graft.operators.Validate.rawPostingRules]];
    * valid rows ride the exact-dedup gate to bronze, invalid rows land
    * in a quarantine dir WITH the rules they broke and their batch id —
    * visible for repair/replay, never silently landed (a null key
    * poisons downstream joins) and never silently dropped (an upstream
    * extractor bug stays invisible). Quarantine appends are at-least-
    * once on crash-replay; quarantined rows carry their batch id, so
    * replay duplicates dedupe trivially downstream.
    */
  def validatedGatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, quarantinePath: String,
      checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        // ONE materialization of the staging read: the empty-quarantine
        // probe, the quarantine write, and the gate's ingest all consume
        // it — un-checkpointed, each action re-reads the JSON and
        // re-evaluates every rule (three scans per micro-batch)
        val once = graft.CacheHygiene.materialize(batch.toDF(), "bronze batch")
        try {
          val (valid, quarantined) =
            graft.operators.Validate.split(once, graft.operators.Validate.rawPostingRules)
          if (!quarantined.isEmpty)
            quarantined.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(quarantinePath)
          graft.CacheHygiene.release(
            MetadataStore.ingestWithGate(valid, bronzePath, metaPath, batchId))
        } finally graft.CacheHygiene.release(once)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The quarantine's way back in — [[validatedGatedIngest]] lands rule
    * breakers visibly, and this closes the loop: apply `fix` (a repair
    * transform — backfill a field, re-encode a payload; identity to just
    * re-test), REVALIDATE against the same rules, ingest the rows that
    * now pass through the regular etag gate, and rewrite the quarantine
    * to hold only the rows that still fail (with their violations
    * recomputed and their original `batch_id` preserved for lineage).
    * The reference's CDC edge implies exactly this reprocessing loop:
    * broken extracts get fixed and re-enter, they don't rot in a corner.
    *
    * `readmitBatchId` must be FRESH per invocation (e.g. a timestamped
    * "readmit-..." id): reusing an id whose commit marker exists would
    * make the gate treat the whole re-admission as an already-committed
    * replay and silently drop it — the one way a re-admission could
    * "trip the gate as a duplicate".
    *
    * Crash-safe by convergence, not atomicity: admitted rows reach
    * bronze BEFORE the quarantine is touched, so a crash between the
    * two leaves already-admitted rows in the quarantine — and the next
    * invocation revalidates them, finds them valid, and the etag gate
    * drops them as the duplicates they now are. The quarantine update
    * is FILE-PRECISE: the parquet files captured at entry are the only
    * ones read, still-failing rows append as fresh files BEFORE the
    * captured files delete, and rows appended concurrently by a live
    * [[validatedGatedIngest]] stream are in neither set — untouched,
    * they wait for the next pass (safe to run against a live stream).
    * Every crash point leaves still-failing rows present, at worst
    * duplicated; quarantine replay duplicates (its appends are
    * at-least-once) collapse here via dropDuplicates before
    * revalidation.
    *
    * Returns (rows admitted to bronze, rows still quarantined).
    */
  def reAdmitQuarantine(spark: SparkSession, quarantinePath: String,
      bronzePath: String, metaPath: String,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      readmitBatchId: String,
      fix: DataFrame => DataFrame = identity): (Long, Long) = {
    val quarRoot = new Path(quarantinePath)
    val f = quarRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a reused id whose commit marker exists would make the gate treat
    // the whole re-admission as an already-committed replay: rows would
    // count as admitted without landing, then vanish in the rewrite -
    // enforce the documented freshness precondition instead of trusting it
    require(!f.exists(new Path(metaPath, s"_commit_$readmitBatchId")),
      s"re-admission: batch id '$readmitBatchId' was already used - " +
        "each invocation needs a fresh id")
    healQuarantineSwap(f, quarRoot)
    if (!f.exists(quarRoot)) return (0L, 0L)
    // FILE-PRECISE snapshot: capture the quarantine's parquet files at
    // entry and operate on exactly those. Rows appended CONCURRENTLY by
    // a live validatedGatedIngest micro-batch land in files outside this
    // list — never read here, never deleted, they simply wait for the
    // next pass. (The previous whole-dir swap moved the dir aside and
    // deleted it, destroying concurrent appends with it.)
    val captured = {
      val it = f.listFiles(quarRoot, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) b += s.getPath
      }
      b.result()
    }
    if (captured.isEmpty) return (0L, 0L)
    val vCol = graft.operators.Validate.ViolationsCol
    val quar = spark.read.parquet(captured.map(_.toString): _*).dropDuplicates()
    // the repair sees payload + batch_id (lineage it must carry through),
    // never the stale violations - those are recomputed from the rules
    val candidates = fix(quar.drop(vCol))
    require(candidates.columns.contains("batch_id"),
      "re-admission: fix must preserve the batch_id lineage column")
    val annotated = graft.CacheHygiene.materialize(
      graft.operators.Validate.check(candidates, rules), "re-admission check")
    try {
      val valid = annotated.filter(size(col(vCol)) === 0).drop(vCol, "batch_id")
      val stillBad = annotated.filter(size(col(vCol)) > 0)
      val admitted = MetadataStore.ingestWithGate(
        valid, bronzePath, metaPath, readmitBatchId)
      val nAdmitted = admitted.count()
      graft.CacheHygiene.release(admitted)
      val nBad = stillBad.count()
      // point of no return passed (bronze has the admitted rows). The
      // still-bad rows APPEND as fresh files BEFORE the captured files
      // delete, so every crash point leaves their rows present —
      // possibly duplicated, which the dropDuplicates read heals on the
      // next pass — and never lost; admitted rows that reappear
      // revalidate and gate out on content (spec'd). Concurrent appends
      // are untouched throughout.
      if (nBad > 0) stillBad.write.mode("append").parquet(quarantinePath)
      captured.foreach(p => f.delete(p, false))
      (nAdmitted, nBad)
    } finally graft.CacheHygiene.release(annotated) // unpersist() on a
    // checkpointed frame is a CacheManager no-op; the blocks need the
    // backing-RDD release or they leak per invocation
  }

  private val SwapPrefix = ".readmit-next."

  /** Adopt a completed-but-unswapped quarantine rewrite: if the live dir
    * is missing and a finished (`_SUCCESS`-marked) rewrite sibling
    * exists, the sibling IS the quarantine — the writer crashed between
    * moving the old dir away and moving the rewrite in.
    */
  private def healQuarantineSwap(f: org.apache.hadoop.fs.FileSystem,
      quarRoot: Path): Unit = {
    val tmp = new Path(quarRoot.getParent, s"$SwapPrefix${quarRoot.getName}")
    if (!f.exists(quarRoot) && f.exists(new Path(tmp, "_SUCCESS")))
      require(f.rename(tmp, quarRoot),
        s"re-admission: could not adopt the crashed rewrite $tmp")
    // moved-aside dirs a crash kept from their delete: their rows are
    // either live in quarRoot (crash pre-swap never moves the old dir)
    // or superseded by the adopted rewrite - safe to drop either way
    if (f.exists(quarRoot) && f.exists(quarRoot.getParent))
      f.listStatus(quarRoot.getParent)
        .filter(_.getPath.getName.startsWith(s".${quarRoot.getName}.old-"))
        .foreach(st => f.delete(st.getPath, true))
  }

  /** Full content hygiene on the streaming ingest edge: the exact
    * re-delivery gate (persistent etags, [[MetadataStore.ingestWithGate]])
    * composed with NEAR-dup gating against everything previously ingested
    * ([[graft.operators.IncrementalDedup]] band signatures). A re-worded
    * or re-whitespaced copy of an already-ingested posting — same tokens,
    * different bytes, so the etag gate alone would admit it — never
    * reaches bronze.
    *
    * Ordering is load-bearing: signatures derive from the batch's rows
    * IN BRONZE (read back after the commit), not from the ingest's
    * return value — so a crashed batch can never poison the near-dup
    * store with content that isn't in bronze, AND a replay of an
    * already-committed batch (whose ingest returns empty, the etags
    * being in the store) still re-records its signatures from the
    * committed files instead of losing them forever. Signature appends
    * are at-least-once — duplicates are harmless to a semi-join gate.
    * Near-dups WITHIN one micro-batch both land (cross-batch is this
    * gate's job; in-batch pairs are q30/q36's).
    */
  def nearDupGatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, sigPath: String,
      checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        // ONE materialization: gate() consumes the batch's band
        // signatures in two join branches and the docs again in its
        // anti-join — un-checkpointed, the staging JSON re-reads ~3×
        // and the MinHash signatures compute twice per micro-batch
        // (the gate's own scaladoc instruction; every sibling ingest
        // checkpoints its batch for the same reason)
        val once = graft.CacheHygiene.materialize(batch.toDF(), "bronze batch")
        try {
          // gate() preserves every input column, so the whole batch rides
          // through it - no second join to recover the survivors
          val survivors = graft.operators.IncrementalDedup.gate(
              once.withColumn("doc_id", xxhash64(col("posting_id")))
                .withColumn("text", col("raw_content")),
              sigPath)
            .drop("doc_id", "text")
          graft.CacheHygiene.release(
            MetadataStore.ingestWithGate(survivors, bronzePath, metaPath, batchId))
          val committed = BronzeLayer.readBatch(spark, bronzePath, batchId)
          graft.operators.IncrementalDedup.appendSignatures(
            committed.select(xxhash64(col("posting_id")).as("doc_id"),
              col("raw_content").as("text")), sigPath)
        } finally graft.CacheHygiene.release(once)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming ingest through the LEXICAL impact-index gate (r20 — the
    * lexical tier's streaming parity with [[nearDupGatedIngest]]'s
    * MinHash and [[SemanticDedupGate]]'s embedding path): a batch
    * posting whose bag of top BM25 terms is already ≥ τ-covered by a
    * document in the PERSISTED impact store
    * ([[graft.operators.ImpactDedupGate]]) never reaches bronze, and
    * committed survivors merge into the store's posting heads so the
    * NEXT batch gates against them.
    *
    * Same crash discipline as the sibling gates: the store append runs
    * on the batch's rows IN BRONZE (read back after the commit), with
    * `ifAbsent = true` so a replay of a committed batch re-records
    * idempotently (the store's id registry drops the already-recorded
    * rows) instead of failing loudly mid-recovery. Staleness: the
    * store's frozen scoring context is the operator's to maintain —
    * run [[graft.operators.TextOps.impactIndexDrift]] (or gate a
    * snapshot through requireImpactFresh) on the re-freeze cadence;
    * this wiring deliberately doesn't tokenize a corpus per
    * micro-batch.
    */
  def lexGatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, indexPath: String,
      checkpointPath: String, tau: Double = 0.8): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        // ONE materialization: the gate consumes the batch in its
        // registry anti-join and its scoring read — un-checkpointed,
        // the staging JSON would re-read per branch (the sibling
        // ingests' shared discipline)
        val once = graft.CacheHygiene.materialize(batch.toDF(), "bronze batch")
        try {
          val survivors = graft.operators.ImpactDedupGate.gate(
              once.withColumn("doc_id", xxhash64(col("posting_id")))
                .withColumn("text", col("raw_content")),
              indexPath, tau)
            .drop("doc_id", "text")
          graft.CacheHygiene.release(
            MetadataStore.ingestWithGate(survivors, bronzePath, metaPath, batchId))
          // the gate's refusal frame rides aboard the survivors plan
          // (its documented checkpoint contract); the commit above was
          // its final consumer — free it, or a long-running stream
          // accumulates one batch-bounded frame per micro-batch
          graft.CacheHygiene.releaseTree(survivors)
          val committed = BronzeLayer.readBatch(spark, bronzePath, batchId)
          graft.operators.TextOps.impactIndexAppend(
            committed.select(xxhash64(col("posting_id")).as("doc_id"),
              col("raw_content").as("text")),
            indexPath, ifAbsent = true)
        } finally graft.CacheHygiene.release(once)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming ingest through the NORMALIZED-content gate (r14), priced
    * by [[graft.operators.BloomDedupGate]]: whitespace/case/reformatting
    * copies — which the metadata gate's byte-exact etag misses and the
    * near-dup gate would only catch past its similarity threshold — are
    * dropped before they land, and because the gate runs FIRST, Bloom
    * negatives (the bulk of a mostly-fresh batch) reach the metadata
    * join pre-shrunk. Same crash discipline as the near-dup gate:
    * fingerprints are recorded from the rows that actually COMMITTED,
    * after the commit, so a replayed batch heals a crash between commit
    * and record.
    */
  def contentGatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, fpStorePath: String,
      checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    // one gate per drain: construction rebuilds the filter from the
    // store, which IS the restart-recovery path
    val gate = new graft.operators.BloomDedupGate(spark, fpStorePath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        // materialize the staging read ONCE: the gate's fresh/suspect
        // branches re-execute their input plan, and without this the
        // staging JSON would be re-read and re-hashed per branch
        val once = graft.CacheHygiene.materialize(batch.toDF(), "bronze batch")
        try {
          val survivors = gate.gate(once, textCol = "raw_content")
          graft.CacheHygiene.release(
            MetadataStore.ingestWithGate(survivors, bronzePath, metaPath, batchId))
          val committed = BronzeLayer.readBatch(spark, bronzePath, batchId)
          gate.record(committed, textCol = "raw_content")
        } finally graft.CacheHygiene.release(once)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** THE composed streaming curation path — the streaming mirror of the
    * batch chain PipelineEndToEndSpec proves: per micro-batch,
    *
    *   1. drift row FIRST, on the raw arrivals (upstream drift must show
    *      before the mixture reshapes the distribution),
    *   2. √-temperature downsample by persisted reference rates
    *      ([[MixtureGate.applyRates]] — dominant sources flatten at the
    *      door, unknown sources admit whole),
    *   3. normalized-content Bloom gate (joinless negatives, suspects
    *      broadcast-verified against the fingerprint store),
    *   4. exact-etag metadata gate → bronze commit,
    *   5. committed rows' fingerprints recorded (crash between commit
    *      and record heals by replay — the store is rebuilt from truth).
    *
    * Every stage is the already-spec'd component; this method is the
    * wiring plus the one materialization the branches share.
    */
  def curatedIngest(spark: SparkSession, stagingPath: String,
      bronzePath: String, metaPath: String, fpStorePath: String,
      ratesPath: String, refHistPath: String, driftPath: String,
      checkpointPath: String, driftThreshold: Double = 0.25): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    val gate = new graft.operators.BloomDedupGate(spark, fpStorePath)
    val raw = BronzePipeline.stagingStream(spark, stagingPath)
    raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchId = f"$pid-$id%05d"
        val once = graft.CacheHygiene.materialize(batch.toDF(), "bronze batch")
        try {
          DriftMonitor.recordDrift(spark, refHistPath, once, driftPath,
            batchId, driftThreshold)
          val sampled = MixtureGate.applyRates(spark, ratesPath, once,
            "source", "raw_content")
          // the Bloom gate is CROSS-batch by contract (it verifies against
          // the store); two normalized copies arriving in the SAME batch
          // need this intra-batch keep-min dedup. Keyed by __fp ALONE —
          // an equi-join on (__fp, posting_id) would let two same-id
          // same-fingerprint rows with different raw bytes BOTH survive
          // (r14 advice) — and the survivor is min of the full row struct
          // (posting_id first), so ties are deterministic where a
          // dropDuplicates or min_by would pick arbitrarily.
          val fp = graft.operators.TextOps.fingerprint(col("raw_content"))
          val dataCols = sampled.columns.toSeq
          val ordered = ("posting_id" +: dataCols.filterNot(_ == "posting_id")).map(col)
          // null raw_content ⇒ null fingerprint. The old equi-join dropped
          // such rows (null keys never match); groupBy would instead pool
          // ALL of them into one group and land a single null-content row
          // in bronze, merging unrelated malformed postings. Keep the
          // drop, explicitly: a row with no content has no dedup identity
          // and nothing to ingest.
          // checkpointed: the Bloom gate's empty-suspect probe and the
          // ingest's materialization are separate ACTIONS — without
          // this, the mixture filter + dedup shuffle + struct-min agg
          // re-execute per consumer (the staging-read checkpoint above
          // covers only the scan, not this aggregation)
          val batchDeduped = graft.CacheHygiene.materialize(
            sampled.withColumn("__fp", fp)
              .filter(col("__fp").isNotNull)
              .groupBy("__fp")
              .agg(org.apache.spark.sql.functions.min(struct(ordered: _*)).as("__r"))
              .select(dataCols.map(c => col(s"__r.$c")): _*),
            "curated batch")
          try {
            val survivors = gate.gate(batchDeduped, textCol = "raw_content")
            graft.CacheHygiene.release(
              MetadataStore.ingestWithGate(survivors, bronzePath, metaPath, batchId))
            val committed = BronzeLayer.readBatch(spark, bronzePath, batchId)
            gate.record(committed, textCol = "raw_content")
          } finally graft.CacheHygiene.release(batchDeduped)
        } finally graft.CacheHygiene.release(once)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming gold mart over the silver tail: per-source hourly posting
    * counts and payload volume. Watermarked, so aggregation state stays
    * bounded no matter how long the pipeline runs; append mode emits each
    * hour exactly once — when the watermark passes it (a later hour's
    * data arriving in this or a subsequent drain) — so repeated scheduled
    * [[martRunOnce]] invocations build the mart incrementally with no
    * overwrites and no recomputation. This is the reference's gold-mart
    * box (docs/Pipeline Architecture.mermaid) as a continuous flow.
    */
  def goldMartStream(spark: SparkSession, bronzePath: String): DataFrame =
    silverStream(spark, bronzePath)
      .withWatermark("extracted_at", "1 hour")
      .groupBy(col("source"), window(col("extracted_at"), "1 hour"))
      .agg(count(lit(1)).as("n_postings"), sum("content_chars").as("total_chars"))
      .select(col("source"), col("window.start").as("hour"),
        col("n_postings"), col("total_chars"))

  /** Drain available bronze into the incremental hourly mart and stop. */
  def martRunOnce(spark: SparkSession, bronzePath: String, martPath: String,
      checkpointPath: String): StreamingQuery =
    goldMartStream(spark, bronzePath).writeStream
      .format("parquet")
      .option("path", martPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stable-per-checkpoint identity: created once next to the checkpoint
    * and re-read on every restart, so replayed micro-batches keep their
    * batch ids (the exactly-once retry path needs that) while a rebuilt
    * checkpoint — whose micro-batch ids restart at 0 — gets a fresh
    * namespace and can never alias an older run's committed batches.
    */
  private[streaming] def pipelineId(spark: SparkSession, checkpointPath: String): String = {
    val dir = new Path(checkpointPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new Path(dir, "_graft_pipeline_id")
    if (fs.exists(f)) {
      val in = fs.open(f)
      val id = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      // a crash between a non-atomic create and its write would have
      // persisted an EMPTY id — and "" passes the batch-id charset
      // check, so two degenerate checkpoints would collide on the same
      // "_commit_-NNNNN" markers, the exact collision the pid prevents.
      // The write below is temp+rename so this can no longer be minted;
      // refuse loudly if a legacy crash left one behind.
      require(id.nonEmpty,
        s"pipeline id file $f is empty (torn legacy write) - delete it " +
          "to mint a fresh id for this checkpoint")
      id
    } else {
      val id = java.util.UUID.randomUUID().toString
      fs.mkdirs(dir)
      // temp + atomic rename: the id file either exists with the full
      // UUID or not at all, never as a zero-byte torn create
      val tmp = new Path(dir, s"._graft_pipeline_id.tmp-$id")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes(StandardCharsets.UTF_8)) finally out.close()
      if (fs.rename(tmp, f)) id
      else { // lost a creation race: adopt the winner's id
        fs.delete(tmp, false)
        pipelineId(spark, checkpointPath)
      }
    }
  }

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

  /** [[runOnce]] with silver as a [[ManifestTable]] instead of a plain
    * parquet dir: each micro-batch is one atomic, token-idempotent commit,
    * so readers get snapshot isolation (never a half-written drain),
    * time travel across drains, and `readRange`/`readWhere` pruning on
    * `extracted_date` — a date-scoped silver query at 100 TB reads only
    * the drains whose recorded date range can match, without physical
    * repartitioning by date.
    *
    * Exactly-once is layered: the checkpoint makes each micro-batch
    * process once per run; [[ManifestTable.commitIdempotent]] makes the
    * crash-replay of a committed-but-unacknowledged micro-batch a no-op
    * (the commit CAS and the replay-visible token are one operation).
    * Empty micro-batches commit nothing.
    */
  def runOnceToTable(spark: SparkSession, bronzePath: String,
      silverTable: String, checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    silverStream(spark, bronzePath).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          ManifestTable.commitIdempotent(batch.toDF(), silverTable,
            f"$pid-$id%05d", statsCols = Seq("extracted_date", "source"))
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[martRunOnce]] with the gold mart as a [[ManifestTable]]: each
    * drain's finalized hours land as one atomic commit with min/max
    * stats on (`hour`, `source`), so a dashboard's "last 24 h" read
    * prunes to the drains that closed those hours instead of scanning
    * the mart's full history — the manifest standing in for physical
    * hour-partitioning. Append-mode emission means commits carry
    * disjoint hour sets (each hour finalizes exactly once), which is
    * what makes the per-commit hour ranges selective.
    */
  def martRunOnceToTable(spark: SparkSession, bronzePath: String,
      martTable: String, checkpointPath: String): StreamingQuery = {
    val pid = pipelineId(spark, checkpointPath)
    goldMartStream(spark, bronzePath).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          ManifestTable.commitIdempotent(batch.toDF(), martTable,
            f"$pid-$id%05d", statsCols = Seq("hour", "source"))
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
