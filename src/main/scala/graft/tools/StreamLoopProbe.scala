package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the streaming lakehouse loop (GraftStreamSource →
  * transform → GraftStreamSink): land a scale dir's orders as a K-commit
  * backlog, drain it through the loop with a fresh checkpoint, and report
  * wall / rows / rows-per-second plus the per-batch row counts. Run at
  * sf0.1 and scratch/sf1.0 (one JVM per run, like ScaleProbe) — the
  * claim this measures is that loop throughput is per-ROW, not
  * per-table: 10× the backlog should drain in ~10× the wall (linear),
  * with per-batch admission behaving identically.
  *
  *   sbt "runMain graft.tools.StreamLoopProbe /root/testdata/sf0.1"
  *   sbt "runMain graft.tools.StreamLoopProbe scratch/sf1.0"
  */
object StreamLoopProbe {
  private val Commits = 5

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.ManifestTable

    val base = "scratch/streamloop-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    val src = s"$base/src"
    val f = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new Path(src, "_manifests"))) {
      // the backlog: orders split into K key-range commits
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val qs = o.stat.approxQuantile("o_orderkey",
        (1 until Commits).map(_.toDouble / Commits).toArray, 0.001)
      val bounds = (Double.NegativeInfinity +: qs.toSeq) :+ Double.PositiveInfinity
      bounds.sliding(2).zipWithIndex.foreach { case (pair, i) =>
        ManifestTable.commit(
          o.filter(col("o_orderkey") > pair.head && col("o_orderkey") <= pair.last),
          src, append = i > 0, statsCols = Seq("o_orderkey"))
      }
    }

    // fresh sink + checkpoint per run: the probe times the DRAIN of the
    // whole backlog through tail → transform → idempotent commits
    val run = java.util.UUID.randomUUID().toString.take(8)
    val dst = s"$base/dst-$run"
    val cp = s"$base/cp-$run"
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(src)
      .withColumn("o_totalprice", round(col("o_totalprice") * 1.1, 2))
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", cp)
      .option("stats", "o_orderkey")
      .outputMode("append").start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val batches = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows)
    q.stop()
    val rows = graft.sources.ManifestTable.read(spark, dst).count()
    println(f"""STREAMLOOP {"dir":"$dir","rows":$rows,"sec":$wall%.2f,"rows_per_sec":${rows / wall}%.0f,"batches":[${batches.mkString(",")}],"sink_version":${ManifestTable.currentVersion(spark, dst)}}""")
    spark.stop()
  }
}
