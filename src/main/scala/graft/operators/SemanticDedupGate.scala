package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incremental SEMANTIC dedup gating — the embedding-space member of the
  * three-tier gate family (exact-etag [[graft.sources.MetadataStore]],
  * MinHash text near-dup [[IncrementalDedup]], Bloom-prefiltered exact
  * [[BloomDedupGate]]): a batch vector is refused when the persisted
  * corpus already holds a vector within cosine ≥ τ — a paraphrased or
  * re-encoded copy that shares no bytes and no shingles with anything
  * ingested still gates out.
  *
  * The blocking structure is [[VectorOps.kmeansAssign]]'s centroid
  * table, persisted ONCE from a reference corpus ([[writeCentroids]] —
  * an explicit operator action, like DriftMonitor's reference
  * histogram): both the store and each batch are labeled against the
  * SAME frozen geometry, so a store row and its near-copy always land
  * in the same cluster and the gate compares only within clusters —
  * never batch × corpus.
  *
  * Join shape at 100 TB (the [[IncrementalDedup]] discipline): the
  * batch side is micro-batch-sized, so it BROADCASTS and the store is
  * only SCANNED — one pass per gate, no shuffle reaches the store at
  * any size estimate (spec-pinned with auto-broadcast disabled).
  * Within-batch twins are q109's job (both admit here, mirroring the
  * other gates' contracts); a zero vector has no direction, so it never
  * blocks and is never blocked (the cosine guard skips it — under ANSI
  * the unguarded division would be an error, not a NaN).
  *
  * τ guidance: 0.9+ refuses only true semantic copies; the gate stores
  * plain (cluster, vec_id, embedding) parquet, so the store doubles as
  * the corpus's cluster-labeled serving table.
  */
object SemanticDedupGate {

  val schema: StructType =
    StructType.fromDDL("cluster BIGINT, vec_id BIGINT, embedding ARRAY<FLOAT>")

  /** Freeze the clustering geometry from a reference corpus: k Lloyd
    * iterations (integer-exact, deterministic — see kmeansAssign),
    * centroids overwritten as (cid, c) parquet. Re-baselining is an
    * explicit operator action; the store must be rebuilt with it (labels
    * from different geometries must never mix).
    */
  def writeCentroids(reference: DataFrame, path: String, k: Int = 64,
      iters: Int = 2): Unit = {
    val iv = graft.CacheHygiene.materialize(
      reference
        .select(col("vec_id"), VectorOps.intVec(col("embedding")).as("q")),
      "semantic-gate reference")
    val cs = VectorOps.lloydCentroids(iv, k, iters)
    graft.CacheHygiene.release(iv)
    val spark = reference.sparkSession
    import spark.implicits._
    cs.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    // freeze-time assignment baseline: how tightly the reference corpus
    // fits its own geometry — what [[assignDrift]] compares every later
    // batch against (the PqDedupGate.writeGeometry discipline)
    assignHist(reference, cs)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(baselinePath(path))
  }

  /** The baseline sits BESIDE the centroid table (the table itself is a
    * plain parquet dir — nothing can nest inside it). */
  private def baselinePath(centroidsPath: String): String =
    s"$centroidsPath.assign"

  /** Integer-exact log2 histogram of per-vector assignment distance (d2
    * to the nearest frozen centroid; bucket = ⌊log2(d2+1)⌋ via binary-
    * string length, no float in the boundary): ≤64 rows however large
    * the input — the PqDedupGate.distortionHist shape over the plain
    * gate's geometry.
    */
  private def assignHist(df: DataFrame,
      centroids: Seq[(Long, Array[Long])]): DataFrame =
    df.select(VectorOps.bestCentroid(VectorOps.intVec(col("embedding")), centroids)
        .getField("d2").as("d2"))
      .select((length(bin(col("d2") + 1)) - 1).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** PSI of a batch's centroid-assignment-distance distribution against
    * the freeze-time baseline — THE staleness signal for the gate's
    * frozen geometry (r17; the plain-gate analog of
    * [[PqDedupGate.distortionDrift]]): centroids trained on yesterday's
    * distribution label tomorrow's shifted embeddings into the wrong
    * clusters, a near-copy and its stored original stop landing in the
    * same cluster, and every refusal decision silently degrades — no
    * individual query errors. Same reading scale as
    * [[graft.streaming.DriftMonitor]]: <0.1 stable, 0.1–0.25 drifting,
    * >0.25 re-run [[writeCentroids]] and rebuild the store. One batch
    * scan into a ≤64-row integer histogram; the PSI arithmetic runs on
    * the joined histograms only.
    */
  def assignDrift(batch: DataFrame, centroidsPath: String): DataFrame = {
    val spark = batch.sparkSession
    val centroids = readCentroids(spark, centroidsPath)
    val p = new Path(baselinePath(centroidsPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"SemanticDedupGate: no assignment baseline at $p — this geometry " +
        "predates the drift probe; re-freeze it with writeCentroids " +
        "(comparing against a guessed baseline would read noise as drift)")
    val batchH = assignHist(batch, centroids).withColumnRenamed("n", "nc")
    val wide = spark.read.parquet(p.toString)
      .withColumnRenamed("n", "nr")
      .join(batchH, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("nr", "nc"))
      .withColumn("__g", lit("semantic"))
    TextOps.psiFromWide(wide, "__g")
      .select(col("n_ref"), col("n_cur"), col("psi"))
  }

  /** The persisted geometry, collected (k×dims — driver-bounded by the
    * same envelope as the IVF centroid tables). Missing file is LOUD:
    * gating against a guessed geometry would silently mislabel.
    */
  private def readCentroids(spark: SparkSession,
      path: String): Seq[(Long, Array[Long])] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"SemanticDedupGate: no centroid table at $path — freeze one with " +
        "writeCentroids(reference) before gating (the geometry defines " +
        "what 'same cluster' means; it cannot be guessed per batch)")
    spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toArray)
  }

  /** Missing store = empty corpus (first batch admits everything). */
  def readStore(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Label `df` (vec_id, embedding, …) against the frozen centroids —
    * per-row codegen argmin over k literals, zero shuffle.
    */
  private def labeled(df: DataFrame,
      centroids: Seq[(Long, Array[Long])]): DataFrame =
    df.withColumn("cluster",
      VectorOps.bestCentroid(VectorOps.intVec(col("embedding")), centroids)
        .getField("cid"))

  /** Batch rows whose cluster holds NO stored vector within cos ≥ τ.
    * The store is scanned once with the labeled batch broadcast into it;
    * the surviving frame keeps the batch's columns plus `cluster` (ready
    * for [[ingest]]'s append).
    */
  def gate(batch: DataFrame, centroidsPath: String, storePath: String,
      tau: Double): DataFrame = {
    val spark = batch.sparkSession
    val centroids = readCentroids(spark, centroidsPath)
    val lab = labeled(batch, centroids)
    val probe = lab
      .select(col("cluster"), col("vec_id").as("b_id"),
        VectorOps.asDouble(col("embedding")).as("b_vec"))
      .withColumn("b_norm", sqrt(VectorOps.dot(col("b_vec"), col("b_vec"))))
    val store = readStore(spark, storePath)
      .select(col("cluster"), VectorOps.asDouble(col("embedding")).as("s_vec"))
      .withColumn("s_norm", sqrt(VectorOps.dot(col("s_vec"), col("s_vec"))))
    // store scanned, batch broadcast: a BroadcastHashJoin that streams
    // the store side however large it grows (never the reverse build).
    // The when() guard is ANSI-load-bearing: a zero vector on either
    // side would make the cosine a division by zero (an ERROR under
    // ANSI, not a NaN) — guarded lazily, it simply never matches
    val hits = store.join(broadcast(probe), Seq("cluster"))
      .filter(when(col("s_norm") * col("b_norm") > 0,
        VectorOps.dot(col("s_vec"), col("b_vec")) /
          (col("s_norm") * col("b_norm")) >= tau).otherwise(lit(false)))
      .select(col("b_id").as("vec_id")).distinct()
    lab.join(broadcast(hits), Seq("vec_id"), "left_anti")
  }

  /** Gate, then append the survivors (cluster-labeled) to the store.
    * Returns the admitted frame. Like the other gates, exactly-once
    * across replays comes from the CALLER's batch bookkeeping
    * (BronzePipeline's checkpoint / batch-keyed landings); this method
    * is the per-batch kernel.
    */
  def ingest(batch: DataFrame, centroidsPath: String, storePath: String,
      tau: Double): DataFrame = {
    val admitted = graft.CacheHygiene.materialize(
      gate(batch, centroidsPath, storePath, tau), "semantic-gate batch")
    admitted.select(col("cluster"), col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Append).parquet(storePath)
    admitted
  }
}
