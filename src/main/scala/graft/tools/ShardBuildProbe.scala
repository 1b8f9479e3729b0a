package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sharded-index BUILD concurrency probe (r9, verdict item 3's timing
  * note): time `ivfShardedIndex` over the same corpus at the same K with
  * buildThreads = 1 (the r8 serial-loop behavior) vs the concurrent
  * default, printing one JSON line each. Run:
  * `sbt "runMain graft.tools.ShardBuildProbe <sfDir> <shards> [threads]"`
  * — e.g. `scratch/sf1.0 8 4`. Each build lands in its own scratch dir;
  * dirs are removed after timing (the probe measures, it does not
  * install an index).
  */
object ShardBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scratch/sf1.0")
    val shards = args.lift(1).map(_.toInt).getOrElse(8)
    val threads = args.lift(2).map(_.toInt)
      .getOrElse(graft.operators.VectorOps.DefaultShardBuildThreads)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.VectorOps
    val corpus = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      .filter(col("vec_id") >= 10)
      .localCheckpoint(true)

    def timeBuild(t: Int): Double = {
      val path = s"scratch/.shardbuild-probe-k$shards-t$t"
      val t0 = System.nanoTime()
      VectorOps.ivfShardedIndex(corpus, path, shards, buildThreads = t)
      val sec = (System.nanoTime() - t0) / 1e9
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      sec
    }
    // serial first, so JIT warmth (shared kernels compile during pass 1)
    // favors the SERIAL number - any measured speedup is then a floor
    val serial = timeBuild(1)
    val conc = timeBuild(threads)
    println(f"""SHARDBUILDPROBE {"dir":"$dir","shards":$shards,"serialSec":$serial%.2f,"threads":$threads,"concurrentSec":$conc%.2f,"speedup":${serial / conc}%.2f}""")
    graft.CacheHygiene.release(corpus)
    spark.stop()
  }
}
