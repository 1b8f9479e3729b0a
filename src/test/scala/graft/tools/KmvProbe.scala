package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Ad-hoc probe: the KMV sketch family at adversarial k. The specs pin
  * k=128 (the cheap default); this measures the "I want ~1% error"
  * setting (k=4096 → expected relative error ~1/√k ≈ 1.6%) over the 10×
  * corpus, recording wall, per-source sketch bytes (the O(k) mergeable
  * state), and realized estimate error — evidencing the O(k) claim at
  * the k where it is biggest.
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("kmv-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/scratch/sf1.0");
        k <- Seq(128, 4096)) {
      val docs = Tables.documents(spark, dir)
      val t0 = System.nanoTime
      val card = TextOps.kmvCardinality(docs, k).collect()
      val w1 = (System.nanoTime - t0) / 1e9
      val maxErr = card.flatMap(r => Option(r.getAs[java.lang.Double]("err_pct")))
        .map(_.doubleValue).foldLeft(0.0)(math.max)
      val kept = card.map(_.getAs[Long]("n_kept")).max
      val t1 = System.nanoTime
      val ov = TextOps.kmvOverlap(docs, k).collect()
      val w2 = (System.nanoTime - t1) / 1e9
      val maxJerr = ov.map(r => math.abs(r.getAs[Double]("est_jaccard") -
        r.getAs[Double]("exact_jaccard"))).foldLeft(0.0)(math.max)
      println(f"KMV $dir k=$k card_wall=$w1%.2f overlap_wall=$w2%.2f " +
        f"sources=${card.length} max_kept=$kept state_bytes=${kept * 8} " +
        f"max_card_err_pct=$maxErr%.2f max_jaccard_abs_err=$maxJerr%.4f")
    }
    spark.stop()
  }
}
