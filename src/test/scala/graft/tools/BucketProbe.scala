package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.Tables

/** Ad-hoc probe: LSH bucket width distribution + q40 pair cos distribution. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $sf ===")
      val banded = VectorOps.bandedSignatures(Tables.documents(spark, sf))
      val widths = banded.groupBy("band", "sig").agg(count(lit(1)).as("w"))
      println("-- top bucket widths --")
      widths.orderBy(col("w").desc).limit(12).collect().foreach(println)
      println("-- width histogram (pow2 bins) --")
      widths.groupBy(ceil(log2(col("w"))).as("bin"))
        .agg(count(lit(1)).as("buckets"), sum(col("w") * col("w")).as("sum_w2"))
        .orderBy("bin").collect().foreach(println)

      // q40: distribution of exact within-label pair cosines
      val v = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val cos = VectorOps.dot(col("a.vec"), col("b.vec")) / (col("a.norm") * col("b.norm"))
      val pairs = v.as("a").join(v.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(round(cos, 6).as("cos"))
      println("-- q40 cos histogram (within-label pairs) --")
      pairs.groupBy(floor(col("cos") * 10).as("bin")).count().orderBy("bin")
        .collect().foreach(println)
      println("-- pairs >= 0.3: " + pairs.filter(col("cos") >= 0.3).count())
    }
    spark.stop()
  }
}
