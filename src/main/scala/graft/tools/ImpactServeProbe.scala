package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Evidence probe for the impact-index persistence lifecycle (r19):
  * measures the serving read THROUGH a persisted store
  * ([[graft.operators.TextOps.impactSearchServe]]) against the in-plan
  * form that rebuilds the index per query batch (q152prod), on the same
  * corpus/query split, and re-asserts row identity at this scale.
  *
  * The point of [[graft.operators.TextOps.writeImpactIndex]] is that a
  * SERVING deployment pays the corpus tokenize+aggregate once per
  * freeze, not once per query batch — this prints both walls so
  * BASELINE.md can state the payoff as a measured number rather than a
  * design claim.
  *
  *   sbt "runMain graft.tools.ImpactServeProbe [sfDir] [passes]"
  */
object ImpactServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") >= graft.operators.TextOps.LexQueryDocs)
    val queries = docs.filter(col("doc_id") < graft.operators.TextOps.LexQueryDocs)
    val store = java.nio.file.Files
      .createTempDirectory("graft_impact_probe").toString + "/idx"

    val tBuild0 = System.nanoTime()
    graft.operators.TextOps.writeImpactIndex(corpus, store)
    val buildS = (System.nanoTime() - tBuild0) / 1e9

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn()
      df.count()
      graft.CacheHygiene.releaseTree(df)
      clear()
      (System.nanoTime() - t0) / 1e9
    }
    // row identity at THIS scale before timing anything
    val served = graft.operators.TextOps.impactSearchServe(queries, store)
      .collect().map(_.toSeq).toSet
    val inPlan = graft.operators.TextOps
      .impactSearch(docs, instrument = false).collect().map(_.toSeq).toSet
    require(served == inPlan,
      s"serve/in-plan divergence at $sfDir: ${served.size} vs ${inPlan.size}")
    clear()
    val serveWalls = (1 to passes).map(_ =>
      time(() => graft.operators.TextOps.impactSearchServe(queries, store)))
    val rebuildWalls = (1 to passes).map(_ =>
      time(() => graft.operators.TextOps.impactSearch(docs, instrument = false)))
    println(f"""{"probe":"impact_serve","sf":"$sfDir","build_s":$buildS%.3f,""" +
      f""""serve_min_s":${serveWalls.min}%.3f,"rebuild_min_s":${rebuildWalls.min}%.3f,""" +
      f""""serve_passes":[${serveWalls.map(w => f"$w%.3f").mkString(",")}],""" +
      f""""rebuild_passes":[${rebuildWalls.map(w => f"$w%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
