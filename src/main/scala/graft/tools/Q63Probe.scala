package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q63 adjudication probe (r9): the round-8 bench left q63_approx_quantile
  * as the lone >2× query (0.36 s floor vs the 0.146 s baseline recorded
  * when the query used TWO scalar percentile_approx calls; r7 fused them
  * into ONE multi-percentage sketch expecting fewer summaries = faster).
  * This probe times the candidate plan shapes head-to-head in one JVM —
  * per-sample times printed, min reported — to find the real cost driver
  * before fixing or re-basing. Run:
  * `sbt "runMain graft.tools.Q63Probe /root/testdata/sf0.1"`.
  */
object Q63Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables.lineitem(spark, dir)

    def timeIt(name: String, n: Int)(mk: => DataFrame): Unit = {
      val samples = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q63probe] $name%-28s min=${samples.min}%.3f " +
        samples.map(s => f"$s%.3f").mkString("samples=[", ",", "]"))
    }

    // JVM/IO warmup on an unrelated shape
    timeIt("warmup_scan_count", 2)(li.groupBy("l_returnflag").count())

    timeIt("multi_pct_10k", 5)(
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("approx_median"),
          col("qs").getItem(1).as("approx_p90")))

    timeIt("two_scalar_10k", 5)(
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_median"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
            .as("approx_p90")))

    timeIt("multi_pct_1k", 5)(
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(1000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("approx_median"),
          col("qs").getItem(1).as("approx_p90")))

    // quantile work with no grouping (isolates per-group summary overhead)
    timeIt("multi_pct_global_10k", 5)(
      li.agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("qs")))

    // the scan + 3-group agg floor with a trivial aggregate
    timeIt("sum_floor", 5)(
      li.groupBy("l_returnflag").agg(sum("l_extendedprice")))

    // the 11 MB single-file, single-row-group table scans as ONE task no
    // matter what maxPartitionBytes says (byte-range splits can't divide
    // a row group) — so the only way to parallelize the GK insertion is
    // an explicit round-robin shuffle of the 2 projected columns (~10 MB)
    // between the scan and the partial aggregation
    timeIt("multi_pct_10k_repart32", 5)(
      li.select("l_returnflag", "l_extendedprice").repartition(32)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("approx_median"),
          col("qs").getItem(1).as("approx_p90")))

    timeIt("multi_pct_10k_repart8", 5)(
      li.select("l_returnflag", "l_extendedprice").repartition(8)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("approx_median"),
          col("qs").getItem(1).as("approx_p90")))

    // re-measure the plain form LAST so JIT-progression can't flatter the
    // repartition variants (earlier probes warmed the shared kernels)
    timeIt("multi_pct_10k_again", 5)(
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("approx_median"),
          col("qs").getItem(1).as("approx_p90")))

    spark.stop()
  }
}
