package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r22 optimization-round probe: isolated min-of-N walls for named
  * queries PLUS the Spark job count per run — the driver-blocking-job
  * evidence the fixed-overhead changes (CC star test, bpe batch, lex
  * stats fuse) claim. Usage:
  *   Test/runMain graft.tools.R22Probe q115_bpe_learn q85_corpus_shuffle
  */
object R22Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: R22Probe <queryName> ...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROF_PASSES", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r22-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // warm the session so pass-1 JIT doesn't pollute mins
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    clear()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val walls = (1 to passes).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime
        val n = fn(spark, sfDir).count()
        val w = (System.nanoTime - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(200)
        val j = jobs.get()
        clear()
        (w, j, n)
      }
      println(f"PROBE $name min=${walls.map(_._1).min}%.3f " +
        f"all=[${walls.map(w => f"${w._1}%.2f").mkString(",")}] " +
        s"jobs=[${walls.map(_._2).mkString(",")}] rows=${walls.head._3}")
    }
    spark.stop()
  }
}
