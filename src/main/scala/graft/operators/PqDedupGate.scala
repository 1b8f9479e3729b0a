package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** PQ-compressed semantic dedup gating — [[SemanticDedupGate]]'s
  * contract on the q131 IVF-PQ store layout: the persisted corpus holds
  * only (cluster, vec_id, codes) — m longs per vector instead of dims
  * floats — and a batch vector is refused when some stored code within
  * its probed clusters reconstructs to within `theta` (exact integer
  * ADC distance², the q130/q131 kernel). This is the gate a 100 TB
  * deployment can actually afford to KEEP HOT: at m=16 the store for
  * 10⁹ vectors is ~tens of GB of codes (vs ~TB of float32), scanned —
  * never shuffled — once per micro-batch.
  *
  * Two deliberate deltas from [[SemanticDedupGate]]:
  *
  *   - the metric is integer L2 on the fixed-point vectors, not cosine
  *     (PQ codes reconstruct positions, not directions); for the
  *     near-copy distances a dedup gate exists to catch, small L2 and
  *     high cosine coincide, and L2 needs no zero-vector guard.
  *   - the batch probes its `nProbe` nearest coarse clusters instead of
  *     exactly one: a near-copy that lands a hair across the cluster
  *     boundary from its stored twin (the blocking scheme's documented
  *     miss) is still compared — PqDedupGateSpec plants exactly that
  *     straggler and shows nProbe=1 missing it, nProbe=2 catching it.
  *
  * `theta` is in int-vec units² (components are floor(x·10⁶ + ½)): an
  * exact copy of a stored vector scores ADC d2 = that vector's own
  * reconstruction distortion, so theta must sit ABOVE the store's
  * recon_d2 percentiles (q129's card — that table is the knob's read)
  * and BELOW the organic nearest-neighbor floor (q124's calibration
  * card). The geometry (coarse centroids + residual codebooks) is
  * frozen once from a reference corpus, like the other gates' stores:
  * labels from different geometries must never mix.
  *
  * Join shape at 100 TB (the house gate discipline): the batch side is
  * micro-batch-sized, so its probe table (batch × nProbe rows)
  * BROADCASTS and the code store is only SCANNED on the cluster-id
  * join — one pass per gate, no shuffle reaches the store at any size
  * estimate (spec-pinned with auto-broadcast disabled). Within-batch
  * twins both admit, mirroring the other gates' contracts (q109/q30 own
  * intra-batch dedup).
  */
object PqDedupGate {

  val schema: StructType =
    StructType.fromDDL("cluster BIGINT, vec_id BIGINT, codes ARRAY<BIGINT>")

  /** Freeze the full IVF-PQ geometry from a reference corpus: kc coarse
    * centroids (integer Lloyd, the q108 kernel) and m residual PQ
    * codebooks (the q129 fused trainer), persisted as two parquet
    * tables under `dir`. Re-baselining is an explicit operator action;
    * the store must be rebuilt with it.
    */
  def writeGeometry(reference: DataFrame, dir: String, kc: Int = 64,
      cIters: Int = 2, m: Int = 16, k: Int = 64, iters: Int = 2): Unit = {
    val spark = reference.sparkSession
    import spark.implicits._
    val iv = graft.CacheHygiene.materialize(
      reference
        .select(col("vec_id"), VectorOps.intVec(col("embedding")).as("q")),
      "pq-gate reference")
    val dims = VectorOps.vecDims(iv)
    val coarse = VectorOps.lloydCentroids(iv, kc, cIters)
    val resid = residualize(iv, coarse)
    val cbs = VectorOps.pqCodebooks(
      resid.select(col("vec_id"), col("r").as("q")), m, k, iters, dims)
    coarse.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    cbs.zipWithIndex
      .flatMap { case (cb, j) => cb.map { case (cid, c) => (j, cid, c.toSeq) } }
      .toDF("j", "cid", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
    // reference distortion histogram: how well the frozen codebooks
    // reconstruct the corpus they were trained on — the baseline
    // [[distortionDrift]] compares every later batch against. Reads
    // `resid` (and through it the iv checkpoint), so the release comes
    // last.
    distortionHist(resid, cbs)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/distortion")
    graft.CacheHygiene.release(iv)
  }

  /** Integer-exact log2 histogram of per-vector reconstruction
    * distortion (bucket = ⌊log2(recon_d2 + 1)⌋ via binary-string length
    * — no float in the bucket boundary): ≤64 rows however large the
    * corpus. `resid` must carry the residual column `r`.
    */
  private def distortionHist(resid: DataFrame,
      cbs: Seq[Seq[(Long, Array[Long])]]): DataFrame =
    resid
      .select(aggregate(
        transform(VectorOps.pqAssignCol(col("r"), cbs),
          b => b.getField("d2")),
        lit(0L), (acc, x) => acc + x).as("recon_d2"))
      .select((length(bin(col("recon_d2") + 1)) - 1).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** PSI of a batch's reconstruction-distortion distribution against the
    * frozen geometry's reference histogram — THE rebuild trigger for a
    * PQ deployment: codebooks trained on yesterday's distribution
    * silently reconstruct tomorrow's shifted embeddings WORSE (every
    * ADC distance and every [[gate]] refusal decision degrades with
    * them), and no individual query errors. Same reading scale as
    * [[graft.streaming.DriftMonitor]]: <0.1 stable, 0.1–0.25 drifting,
    * >0.25 re-run [[writeGeometry]] and rebuild the store. One batch
    * scan into a ≤64-row integer histogram; the PSI arithmetic runs on
    * the joined histograms only.
    */
  def distortionDrift(batch: DataFrame, geometryDir: String): DataFrame = {
    val spark = batch.sparkSession
    val (coarse, cbs) = readGeometry(spark, geometryDir)
    val p = new Path(s"$geometryDir/distortion")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"PqDedupGate: no reference distortion histogram at $p — this " +
        "geometry predates the drift probe; re-freeze it with " +
        "writeGeometry (comparing against a guessed baseline would " +
        "read noise as drift)")
    val iv = batch
      .select(col("vec_id"), VectorOps.intVec(col("embedding")).as("q"))
    val batchH = distortionHist(residualize(iv, coarse), cbs)
      .withColumnRenamed("n", "nc")
    val wide = spark.read.parquet(s"$geometryDir/distortion")
      .withColumnRenamed("n", "nr")
      .join(batchH, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("nr", "nc"))
      .withColumn("__g", lit("pq"))
    TextOps.psiFromWide(wide, "__g")
      .select(col("n_ref"), col("n_cur"), col("psi"))
  }

  /** The frozen geometry, collected (k·dims-long envelopes, like every
    * centroid kernel). Missing tables are LOUD — gating against a
    * guessed geometry would silently mislabel.
    */
  private[operators] def readGeometry(spark: SparkSession, dir: String)
      : (Seq[(Long, Array[Long])], Seq[Seq[(Long, Array[Long])]]) = {
    def loud(path: String): Unit = {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(p),
        s"PqDedupGate: no geometry at $path — freeze one with " +
          "writeGeometry(reference) before gating (the coarse centroids " +
          "and codebooks define every stored code; they cannot be " +
          "guessed per batch)")
    }
    loud(s"$dir/centroids"); loud(s"$dir/codebooks")
    val coarse = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toArray)
      .sortBy(_._1).toSeq
    val cbs = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Long]](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(t => t._2 -> t._3).toSeq)
    (coarse, cbs)
  }

  /** (vec_id, ccid, r): one PqAssign(m=1) kernel scan for the list id,
    * one lookup+zip_with for the integer residual.
    */
  private[operators] def residualize(iv: DataFrame,
      coarse: Seq[(Long, Array[Long])]): DataFrame = {
    val cLut = map(coarse.flatMap { case (cid, c) =>
      Seq(lit(cid), array(c.map(lit(_)).toSeq: _*)) }: _*)
    iv.select(col("vec_id"), col("q"),
        element_at(VectorOps.pqAssignCol(col("q"), Seq(coarse)), 1)
          .getField("cid").as("ccid"))
      .select(col("vec_id"), col("q"), col("ccid"),
        zip_with(col("q"), element_at(cLut, col("ccid")),
          (a, b) => a - b).as("r"))
  }

  /** Missing store = empty corpus (first batch admits everything). */
  def readStore(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Batch rows with NO stored code within ADC distance² ≤ theta in any
    * of their nProbe probed clusters. The surviving frame keeps the
    * batch's columns plus `cluster` and `codes` (its own, w.r.t. its
    * rank-1 cluster — ready for [[ingest]]'s append).
    */
  def gate(batch: DataFrame, geometryDir: String, storePath: String,
      theta: Long, nProbe: Int = 0): DataFrame = {
    require(theta >= 0, s"PqDedupGate: theta must be >= 0, got $theta")
    val spark = batch.sparkSession
    import spark.implicits._
    val (coarse, cbs) = readGeometry(spark, geometryDir)
    // nProbe <= 0 = AUTO against the frozen kc ([[VectorOps.ivfpqAutoProbes]]):
    // a fixed probe count over a geometry someone re-freezes at production
    // kc would silently re-open the boundary-straggler miss the nProbe>1
    // design exists to close
    val np = if (nProbe > 0) nProbe
      else VectorOps.ivfpqAutoProbes(coarse.size)
    require(np >= 1 && np <= coarse.size,
      s"PqDedupGate: need 1 <= nProbe=$np <= kc=${coarse.size}")
    val iv = batch.withColumn("__q", VectorOps.intVec(col("embedding")))
    // probe table: batch × kc rows against the literal centroid frame,
    // nProbe nearest kept, the query residualized per probed cluster
    val centDf = coarse.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cluster", "cvec")
    val probeScored = iv
      .select(col("vec_id").as("b_id"), col("__q"))
      .crossJoin(broadcast(centDf))
      .select(col("b_id"), col("cluster"),
        (-aggregate(zip_with(col("__q"), col("cvec"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
          .as("__neg"),
        zip_with(col("__q"), col("cvec"), (a, b) => a - b).as("qr"))
    val probed = VectorOps
      .rankTopK(probeScored, "b_id", "cluster", "__neg", k = np)
      .select(col("b_id"), col("cluster"), col("qr"))
    // store scanned, probe broadcast: a BroadcastHashJoin that streams
    // the code store however large it grows (never the reverse build)
    val hits = readStore(spark, storePath).join(broadcast(probed), Seq("cluster"))
      .filter(VectorOps.pqAdcCol(col("qr"), col("codes"), cbs) <= theta)
      .select(col("b_id").as("vec_id")).distinct()
    // survivors carry their own cluster + codes for the append —
    // computed inline on the anti-joined frame (a second derivative of
    // `batch` joined back on vec_id would be a self-join)
    val cLut = map(coarse.flatMap { case (cid, c) =>
      Seq(lit(cid), array(c.map(lit(_)).toSeq: _*)) }: _*)
    iv.join(broadcast(hits), Seq("vec_id"), "left_anti")
      .withColumn("cluster",
        element_at(VectorOps.pqAssignCol(col("__q"), Seq(coarse)), 1)
          .getField("cid"))
      .withColumn("codes",
        transform(VectorOps.pqAssignCol(
          zip_with(col("__q"), element_at(cLut, col("cluster")),
            (a, b) => a - b), cbs), b => b.getField("cid")))
      .drop("__q")
  }

  /** Gate, then append the survivors' CODES to the store (the batch's
    * float embeddings never land — the store stays m longs per vector).
    * Exactly-once across replays comes from the caller's batch
    * bookkeeping, like the other gates.
    */
  def ingest(batch: DataFrame, geometryDir: String, storePath: String,
      theta: Long, nProbe: Int = 0): DataFrame = {
    val admitted = graft.CacheHygiene.materialize(
      gate(batch, geometryDir, storePath, theta, nProbe), "pq-gate batch")
    admitted.select(col("cluster"), col("vec_id"), col("codes"))
      .write.mode(SaveMode.Append).parquet(storePath)
    admitted
  }
}
