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
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = VectorOps.q38EmbedTopk(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      for (iters <- Seq(1, 2, 3); reps <- Seq(1, 2, 3)) {
        val ivf = VectorOps.ivfTopk(all, numProbes = 8, lloydIters = iters,
            assignReplicas = reps)
          .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
        val recall = (exact & ivf).size.toDouble / exact.size
        println(s"$sf iters=$iters reps=$reps recall=$recall")
      }
    }
    spark.stop()
  }
}
