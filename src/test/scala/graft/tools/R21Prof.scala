package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 optimization-round profiler: isolated min-of-N walls for named
  * queries (the bench's count() action and cache hygiene, without the
  * full-suite positional noise), plus a `pieces:q94` mode that times the
  * q94 closure's sub-stages separately so the mining/closure split is
  * measured, not guessed. Usage:
  *   Test/runMain graft.tools.R21Prof q94_dedup_components pieces:q94
  */
object R21Prof {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: R21Prof <queryName|pieces:q94> ...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROF_PASSES", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r21-prof")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime
        val n = mk.count()
        clear()
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"PROF $label min=${walls.map(_._1).min}%.3f " +
        f"all=[${walls.map(w => f"${w._1}%.2f").mkString(",")}] rows=${walls.head._2}")
    }

    // warm the session so pass-1 JIT doesn't pollute mins
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    clear()

    args.foreach {
      case "pieces:q94" =>
        val docs = graft.sources.Tables.documents(spark, sfDir)
        time("q94.edges(ngramJaccard uncapped)") {
          graft.operators.TextOps.ngramJaccard(docs, maxShingleDF = Int.MaxValue)
        }
        time("q94.cc(edges+closure)") {
          graft.operators.ConnectedComponents.run(
            graft.operators.TextOps.ngramJaccard(docs, maxShingleDF = Int.MaxValue)
              .select(col("a_id").as("src"), col("b_id").as("dst")))
        }
        time("q94.full") {
          graft.operators.TextOps.q94DedupComponents(spark, sfDir)
        }
        println(s"PROF q94.cc rounds=${graft.operators.ConnectedComponents.lastRounds} " +
          s"roundEdges=${graft.operators.ConnectedComponents.lastRoundEdges}")
      case name =>
        val fn = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name"))
        time(name) { fn(spark, sfDir) }
    }
    spark.stop()
  }
}
