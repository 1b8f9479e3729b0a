package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps
import graft.sources.Tables

/** Ad-hoc probe: PQ/ADC recall@5 vs exact for various (m, k) grids. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("pq-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.embeddings(spark, sys.props.getOrElse("pq.sf", "/root/testdata/sf0.001"))
    for ((m, k, it) <- Seq((8, 64, 2), (16, 16, 6), (16, 64, 2))) {
      val t0 = System.nanoTime
      val rows = VectorOps.pqTopk(df, m = m, k = k, iters = it).collect()
      val hits = rows.count(r => !r.isNullAt(r.fieldIndex("exact_rk")))
      println(f"PQSCAN m=$m k=$k iters=$it recall@5=${hits / 50.0}%.2f " +
        f"wall=${(System.nanoTime - t0) / 1e9}%.1fs")
    }
    for ((np, m, k) <- Seq((2, 16, 64), (4, 16, 64), (8, 16, 64))) {
      val t0 = System.nanoTime
      val rows = VectorOps.ivfpqTopk(df, nProbe = np, m = m, k = k).collect()
      val hits = rows.count(r => !r.isNullAt(r.fieldIndex("exact_rk")))
      println(f"IVFPQ nProbe=$np m=$m k=$k recall@5=${hits / 50.0}%.2f " +
        f"wall=${(System.nanoTime - t0) / 1e9}%.1fs")
    }
    // persisted-index lifecycle at 10×: build once, serve thrice (min
    // wall), count the list partitions the probe read actually touches
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/scratch/sf1.0")) {
      val idx = java.nio.file.Files.createTempDirectory("pqprobe_idx").toString
      val corpus = Tables.embeddings(spark, dir)
      val t0 = System.nanoTime
      VectorOps.ivfpqBuild(corpus.filter(
        org.apache.spark.sql.functions.col("vec_id") >= 10), idx,
        kc = 8, m = 16, k = 64)
      val tb = (System.nanoTime - t0) / 1e9
      val qs = corpus.filter(
        org.apache.spark.sql.functions.col("vec_id") < 10)
      val walls = (1 to 3).map { _ =>
        val t1 = System.nanoTime
        val n = VectorOps.ivfpqSearch(spark, idx, qs).count()
        ((System.nanoTime - t1) / 1e9, n)
      }
      println(f"IVFPQIDX $dir build=$tb%.2f search=${walls.map(_._1).min}%.2f " +
        f"rows=${walls.head._2}")
    }
    // 10× scale probe: sf0.1 vs the scratch sf1.0 derivative (the
    // BASELINE.md probe-table protocol — min of 3 timed passes each)
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/scratch/sf1.0");
        (name, fn) <- Seq(
          ("q129", VectorOps.q129PqCodes _),
          ("q130", VectorOps.q130PqTopk _),
          ("q131", VectorOps.q131IvfpqTopk _))) {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime
        val n = fn(spark, dir).count()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"SCALE $name $dir wall=${walls.map(_._1).min}%.2f " +
        f"rows=${walls.head._2}")
    }
    spark.stop()
  }
}
