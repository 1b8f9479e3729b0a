package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Incremental near-dup gating: the content-similarity analog of
  * `MetadataStore`'s exact-etag dedup edge (finnoio/jobhouse mermaid:
  * Meta -..-> "Deduplication Check"). The corpus's MinHash band
  * signatures persist as a parquet store; each incoming batch is gated
  * by an anti-join against it, so a near-duplicate of ANYTHING already
  * ingested — not just byte-identical re-deliveries — is dropped before
  * it lands.
  *
  * Shape for scale: the store holds bands × n rows of (band, sig,
  * doc_id); the gate is one equi-join on (band, sig) against the new
  * batch's signatures — never a doc × corpus comparison. A hot corpus
  * bucket costs nothing here (semi-join, not pair listing), so no width
  * cap is needed. Empty/whitespace-only docs carry no signature
  * (VectorOps.tokenBearing) and always pass — they are q30's exact-dedup
  * concern, not LSH's.
  */
object IncrementalDedup {

  val schema: StructType =
    StructType.fromDDL("doc_id BIGINT, band INT, sig BIGINT")

  def appendSignatures(docs: DataFrame, path: String): Unit =
    VectorOps.bandedSignatures(docs)
      .write.mode(SaveMode.Append).parquet(path)

  /** Missing store = empty corpus. */
  def readSignatures(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Docs sharing no LSH band bucket with the persisted corpus. Dedup
    * WITHIN the batch is the exact/pairwise family's job (q30/q36) —
    * two fresh near-dups arriving in one batch both pass this gate.
    */
  def gate(docs: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val seen = readSignatures(docs.sparkSession, path).select("band", "sig")
    // Join SHAPE for a corpus-scale store: the batch's signatures are
    // micro-batch-sized (bands × |batch| rows; admission-capped upstream),
    // so they BROADCAST and the store is only SCANNED - a semi-join
    // probing each store row against the broadcast batch. The naive
    // direction (batch left_semi store) hash-builds on the store side:
    // past the broadcast threshold that plan SHUFFLES the whole
    // signature store every batch. Spec-pinned with auto-broadcast
    // disabled: no shuffle reaches the store at any size estimate.
    val batchSigs = VectorOps.bandedSignatures(docs)
    val hitSigs = seen
      .join(broadcast(batchSigs.select("band", "sig").distinct()),
        Seq("band", "sig"), "left_semi")
      .distinct()
    val hit = batchSigs.join(broadcast(hitSigs), Seq("band", "sig"), "left_semi")
      .select("doc_id").distinct()
    docs.join(broadcast(hit), Seq("doc_id"), "left_anti")
  }

  /** Gate, land the survivors' signatures, return the survivors. The
    * returned frame is an eager checkpoint — callers should
    * `graft.CacheHygiene.release` it once consumed, or its blocks outlive
    * the batch.
    */
  def ingest(docs: DataFrame, path: String): DataFrame = {
    // materialize once: the gate result feeds both the signature append
    // and the caller, and must not re-read the store mid-flow
    val fresh = graft.CacheHygiene.materialize(gate(docs, path),
      "minhash-gate batch")
    appendSignatures(fresh, path)
    fresh
  }
}
