package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B wall-clock probe for the r21 LM restructure: the two
  * candidate shapes run ALTERNATELY in one JVM (A B A B ...), so rig
  * contamination hits both alike and the min-per-shape comparison is
  * meaningful on a co-tenanted box. Shapes are reconstructed inline.
  * Usage: Test/runMain graft.tools.R21Ab unigram [rounds]
  */
object R21Ab {
  def main(args: Array[String]): Unit = {
    val what = if (args.nonEmpty) args(0) else "unigram"
    val rounds = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r21-ab")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps.tokens

    def docs = graft.sources.Tables.documents(spark, sfDir)
    def toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)

    // OLD q91 shape: independent vocab-keyed agg (second explode)
    def uniOld(): DataFrame = {
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
        .join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }
    // NEW q91 shape: vocab derived from the doc-keyed count
    def uniNew(): DataFrame = {
      val dc = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      val vocab = dc.groupBy("w").agg(sum("n").as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      dc.join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }
    // NEW+checkpoint variant: doc-keyed count materialized once
    def uniCkpt(): DataFrame = {
      val dc = graft.CacheHygiene.materialize(
        toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n")), "ab dc")
      val vocab = dc.groupBy("w").agg(sum("n").as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      dc.join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }

    val shapes: Seq[(String, () => DataFrame)] = what match {
      case "unigram" => Seq("old" -> (() => uniOld()), "new" -> (() => uniNew()),
        "ckpt" -> (() => uniCkpt()))
      case x => sys.error(s"unknown ab target $x")
    }
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // warm all shapes once
    shapes.foreach { case (_, mk) => mk().count(); clear() }
    val walls = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to rounds; (name, mk) <- shapes) {
      val t0 = System.nanoTime
      val n = mk().count()
      clear()
      walls(name) = ((System.nanoTime - t0) / 1e9) :: walls(name)
      assert(n > 0)
    }
    shapes.foreach { case (name, _) =>
      val ws = walls(name)
      println(f"AB $what/$name min=${ws.min}%.3f med=${ws.sorted.apply(ws.size / 2)}%.3f " +
        f"all=[${ws.reverse.map(w => f"$w%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
