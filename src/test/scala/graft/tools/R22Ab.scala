package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r22 interleaved A/B: both widthCappedPairs shapes — WITH and WITHOUT
  * the shared-bucket (w > 1) prefilter — alternate in one JVM over the
  * q36 banded signatures, so co-tenant noise hits both alike (the R21Ab
  * discipline). Usage:
  *   Test/runMain graft.tools.R22Ab [rounds]
  */
object R22Ab {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r22-ab")
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

    // the q36 kernel with a switchable singleton-bucket prefilter
    def pairs(prefilter: Boolean): DataFrame = {
      val bucketed = graft.operators.VectorOps.bandedSignaturesPortable(docs)
      val keyCols = Seq("band", "sig")
      val based = graft.CacheHygiene.materialize(bucketed, "ab buckets")
      val stats0 = based.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("w"), min(struct(col("doc_id"))).as("m"))
      val stats = if (prefilter) stats0.filter(col("w") > 1) else stats0
      val keyed = based.join(stats, keyCols)
      val narrow = keyed.filter(col("w") <= 512).drop("w", "m")
      val joinCond = keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
        .reduce(_ && _) && col("a.doc_id") < col("b.doc_id")
      val narrowPairs = narrow.as("a")
        .join(narrow.hint("shuffle_hash").as("b"), joinCond)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      val starPairs = keyed
        .filter(col("w") > 512 && col("doc_id") =!= col("m.doc_id"))
        .select(col("m.doc_id").as("a_id"), col("doc_id").as("b_id"))
      narrowPairs.union(starPairs)
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared_bands"))
    }

    // the q35 exact-string shingle index with a switchable df>1 semi
    // prefilter ahead of the pair self-join
    def jac(prefilter: Boolean): DataFrame = {
      val raw = docs.select(col("doc_id"), col("lang"),
        explode(graft.plans.GraftFunctions.shingles(
          graft.operators.TextOps.tokens(col("text")), 3)).as("s"))
      val ex = graft.CacheHygiene.materialize(raw.distinct(), "ab shingle index")
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val index =
        if (!prefilter) ex
        else ex.join(
          ex.groupBy("s", "lang").agg(count(lit(1)).as("df"))
            .filter(col("df") > 1).select("s", "lang").hint("shuffle_hash"),
          Seq("s", "lang"), "left_semi")
      val inter = index.as("a")
        .join(index.hint("shuffle_hash").as("b"),
          col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      val j = col("inter").cast("double") /
        (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")
      inter.join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
        .filter(j >= 0.8)
        .select(col("a_id"), col("b_id"), round(j, 4).as("jaccard"))
    }

    val mk: Boolean => DataFrame =
      if (args.length > 1 && args(1) == "q35") jac else pairs
    // warm both codegen paths
    mk(false).count(); clear()
    mk(true).count(); clear()
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { _ =>
      var t0 = System.nanoTime
      val na = mk(false).count(); clear()
      as += (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      val nb = mk(true).count(); clear()
      bs += (System.nanoTime - t0) / 1e9
      require(na == nb, s"row mismatch: $na vs $nb")
    }
    def stats(xs: Array[Double]) = {
      val s = xs.sorted
      f"min=${s.head}%.3f med=${s(s.length / 2)}%.3f all=[${s.map(x => f"$x%.2f").mkString(",")}]"
    }
    println(s"AB no-prefilter ${stats(as.result())}")
    println(s"AB prefilter    ${stats(bs.result())}")
    spark.stop()
  }
}
