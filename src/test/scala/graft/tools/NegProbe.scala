package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps
import graft.sources.Tables

/** Ad-hoc probe: hard-negative mining (q143) along the ANCHOR axis —
  * the dimension the registered query (100 anchors) does not exercise.
  * Both passes broadcast the anchor set against the streamed corpus,
  * so wall should grow ~linearly in anchors (per-row work is
  * anchors × dot) while state stays anchors-sized; this measures
  * 100 → 1000 anchors over the 10× corpus, evidencing where the
  * broadcast envelope ends (TUNING.md: shard anchor sets beyond ~10k).
  */
object NegProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("neg-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/scratch/sf1.0");
        span <- Seq(100L, 1000L)) {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime
        val n = VectorOps.hardNegatives(
          Tables.embeddings(spark, dir), k = 5, querySpan = span).count()
        spark.sharedState.cacheManager.clearCache()
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"NEG dir=$dir anchors=$span rows=${walls.head._2} " +
        f"wall=${walls.map(_._1).min}%.2f")
    }
    spark.stop()
  }
}
