package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.Tables

/** Ad-hoc probe: IVF recall@5 vs exact for various configs. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("ivf-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // args: [dir ...] — defaults to the two small SFs; nProbe sweep is
    // fixed (r17: recall vs probe count is the scale-rule evidence)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (sf <- dirs) {
      val exact = VectorOps.q38EmbedTopk(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val n = all.filter(col("vec_id") >= 10).count()
      val c = VectorOps.ivfNumCentroids(n)
      println(s"$sf corpus=$n centroids=$c")
      for (probes <- Seq(4, 8, 12, 16, 24, 32, 0)) {
        val ivf = VectorOps.ivfTopk(all, numProbes = probes)
          .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
        val recall = (exact & ivf).size.toDouble / exact.size
        println(s"$sf nProbe=$probes recall=$recall")
      }
    }
    spark.stop()
  }
}
