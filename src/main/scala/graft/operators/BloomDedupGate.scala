package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

/** Cross-batch EXACT-content dedup gate for streaming ingest — the
  * persistent form of [[TextOps.bloomGate]], and the third gate tier
  * beside `MetadataStore` (exact delivery identity) and
  * [[IncrementalDedup]] (near-dup similarity): it drops re-delivered
  * content that arrives under a NEW id and is not merely similar but
  * byte-identical after normalization.
  *
  * State is two-layered, and only one layer is the truth:
  *
  *   - a parquet fingerprint store (`fp` per ingested doc) — the durable
  *     corpus record; every admit decision is exact against it;
  *   - a driver-held Bloom filter over the same fingerprints — a PRICE
  *     optimization only. Batch rows the filter rules out admit with no
  *     join at all; only the suspect sliver (true dups + fpp·batch) is
  *     verified, by broadcasting the suspect fps and semi-joining the
  *     store against them — the store is scanned, never shuffled, and
  *     the scan is skipped entirely when no row is suspect.
  *
  * The filter updates WITHOUT collecting rows: each recorded batch
  * builds its own small filter distributed (same bit parameters, so the
  * sketches are mergeable) and the driver merges it in — the only bytes
  * that cross to the driver are the delta filter itself. When inserts
  * outgrow the filter's sizing it saturates (correctness unaffected —
  * everything routes to verification); the gate detects that and
  * rebuilds from the store at `headroom` × the new cardinality, so
  * rebuilds amortize to O(log n) store scans over the corpus's life.
  * A restart rebuilds the filter from the store: the filter is never
  * the record.
  */
class BloomDedupGate(spark: SparkSession, storePath: String,
    fpp: Double = 0.01, headroom: Double = 4.0) {

  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
  require(headroom > 1, s"headroom must exceed 1: $headroom")

  private var capacity: Long = 0L
  private var inserted: Long = 0L
  // master is driver-owned and only ever GROWS (mergeInPlace adds bits);
  // the broadcast re-snapshots it after every mutation. Even if a local-
  // mode alias let a running task see a mid-merge master, a superset
  // filter only turns admits into verifications - exactness is untouched.
  private var master: BloomFilter = _
  private var bc: Broadcast[BloomFilter] = _
  rebuildFromStore()

  private def storeFps(): DataFrame = {
    val p = new Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(BloomDedupGate.schema).parquet(storePath)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        BloomDedupGate.schema)
  }

  /** One store scan: size for the CURRENT corpus × headroom and rebuild.
    * Called at construction (restart recovery) and on saturation.
    */
  def rebuildFromStore(): Unit = {
    val fps = storeFps()
    val n = fps.count()
    capacity = math.max(1024L, (n * headroom).toLong)
    master = BloomDedupGate.buildFilter(fps, capacity, fpp)
    inserted = n
    refreshBroadcast()
  }

  private def refreshBroadcast(): Unit = {
    if (bc != null) bc.unpersist(blocking = false)
    bc = spark.sparkContext.broadcast(master)
  }

  /** Admit exactly the batch rows whose normalized fingerprint is absent
    * from the store. All input columns ride through. Dedup WITHIN the
    * batch is q30's job — two copies arriving together both pass here.
    */
  def gate(batch: DataFrame, textCol: String = "text"): DataFrame = {
    if (inserted > capacity) rebuildFromStore() // saturated: resize first
    val batchFp = batch.withColumn("__fp", TextOps.fingerprint(col(textCol)))
    val maybe = graft.plans.BloomMightContain.might(col("__fp"), bc)
    // null fingerprint equals nothing -> always fresh, no-join branch
    val fresh = batchFp.filter(coalesce(!maybe, lit(true)))
    val suspects = batchFp.filter(coalesce(maybe, lit(false)))
    val suspectFps = suspects.select(col("__fp").as("fp")).distinct()
    val admitted =
      if (suspectFps.isEmpty) fresh // common case: no store scan at all
      else {
        val hits = storeFps()
          .join(broadcast(suspectFps), Seq("fp"), "left_semi").distinct()
        fresh.unionByName(
          suspects.join(broadcast(hits.withColumnRenamed("fp", "__fp")),
            Seq("__fp"), "left_anti"))
      }
    admitted.drop("__fp")
  }

  /** Land `docs`' fingerprints in the store and fold them into the
    * filter. Call with the rows that actually COMMITTED (read back from
    * bronze), after the commit — a crash between commit and record is
    * healed by the replayed batch re-recording (the store tolerates
    * duplicate fp rows; a Bloom merge is idempotent set union).
    */
  def record(docs: DataFrame, textCol: String = "text"): Unit = {
    val fps = docs.select(TextOps.fingerprint(col(textCol)).as("fp"))
      .na.drop().distinct()
    fps.write.mode(SaveMode.Append).parquet(storePath)
    // distributed delta build with IDENTICAL bit parameters -> mergeable;
    // only the sketch bytes reach the driver, never rows
    val delta = BloomDedupGate.buildFilter(fps, capacity, fpp)
    master.mergeInPlace(delta)
    inserted += delta.cardinality()
    refreshBroadcast()
  }

  /** Exposed for specs: (capacity, inserted). */
  def sizing: (Long, Long) = (capacity, inserted)
}

object BloomDedupGate {
  val schema: StructType = StructType.fromDDL("fp STRING")

  /** `stat.bloomFilter` NPEs on a zero-row frame (the aggregate yields
    * null bytes); an empty corpus gets an empty filter built with the
    * SAME (expectedNumItems, fpp) sizing, so later distributed deltas
    * stay bit-compatible for mergeInPlace (verified: both paths produce
    * the V2 impl with identical bitSize).
    */
  def buildFilter(fps: DataFrame, capacity: Long, fpp: Double): BloomFilter =
    if (fps.isEmpty) BloomFilter.create(capacity, fpp)
    else fps.stat.bloomFilter("fp", capacity, fpp)
}
