package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r22 interleaved A/B: the q145 BM25 shape with the r21 lineage (eager
  * tf checkpoint + in-plan (nd, avgl) broadcast) vs the r22 lineage
  * (lazy tf checkpoint first-touched by the scalar collect, stats as
  * literals). Usage:
  *   Test/runMain graft.tools.R22AbLex [rounds]
  */
object R22AbLex {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r22-ab-lex")
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
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val (k, k1, b) = (3, 1.2, 0.75)

    def termCounts(d: DataFrame): DataFrame =
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))

    def top(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
    }

    def bm25Old(): DataFrame = {
      val tf = graft.CacheHygiene.materialize(termCounts(docs), "ab tf old")
      val dl = tf.groupBy("doc_id").agg(sum("n").as("len"))
      val stats = dl.agg(count(lit(1)).as("nd"), avg("len").as("avgl"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log((col("nd").cast("double") - col("df") + 0.5) /
        (col("df") + 0.5) + 1.0)
      val norm = lit(k1) * (lit(1 - b) + lit(b) * col("len").cast("double") / col("avgl"))
      top(tf.join(dl, "doc_id").join(dfc, "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"),
          round(idf * (col("n") * lit(k1 + 1)) / (col("n") + norm), 6).as("score")))
    }

    def bm25New(): DataFrame = {
      val tf = termCounts(docs).localCheckpoint(eager = false)
      val dl = tf.groupBy("doc_id").agg(sum("n").as("len"))
      val r = dl.agg(count(lit(1)).as("nd"), avg("len").as("avgl")).collect()(0)
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log((lit(r.getLong(0)).cast("double") - col("df") + 0.5) /
        (col("df") + 0.5) + 1.0)
      val norm = lit(k1) * (lit(1 - b) + lit(b) * col("len").cast("double") / lit(r.getDouble(1)))
      top(tf.join(dl, "doc_id").join(dfc, "term")
        .select(col("doc_id"), col("term"),
          round(idf * (col("n") * lit(k1 + 1)) / (col("n") + norm), 6).as("score")))
    }

    bm25Old().count(); clear()
    bm25New().count(); clear()
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { _ =>
      var t0 = System.nanoTime
      val na = bm25Old().count(); clear()
      as += (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      val nb = bm25New().count(); clear()
      bs += (System.nanoTime - t0) / 1e9
      require(na == nb, s"row mismatch: $na vs $nb")
    }
    def stats(xs: Array[Double]) = {
      val s = xs.sorted
      f"min=${s.head}%.3f med=${s(s.length / 2)}%.3f all=[${s.map(x => f"$x%.2f").mkString(",")}]"
    }
    println(s"AB bm25 old(eager+bcast) ${stats(as.result())}")
    println(s"AB bm25 new(lazy+lit)    ${stats(bs.result())}")
    spark.stop()
  }
}
