package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.Tables

/** q62 adjudication probe (r14): q62_range_join is the last BASELINE.md
  * row above 1.5× with neither a clean ratio nor an adjudication note —
  * 0.605–0.608 s quiet-rig floors across r8/r12/r13 vs the 0.378 s r2
  * baseline (1.60×), measured on three different rig classes. The plan is
  * a grid-binned hash join (no nested loop), so the probe decomposes the
  * query into additive stages timed head-to-head in one JVM: the bare
  * scan+filter floors, the bin preparation of each side, the equi-join,
  * and the final aggregate — plus candidate variants (explicit broadcast,
  * no-bin broadcast nested loop) to see whether any plan change wins.
  * Run: `sbt "runMain graft.tools.Q62Probe /root/testdata/sf0.1"`.
  */
object Q62Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(name: String, n: Int)(mk: => DataFrame): Unit = {
      val samples = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q62probe] $name%-28s min=${samples.min}%.3f " +
        samples.map(s => f"$s%.3f").mkString("samples=[", ",", "]"))
    }

    val Week = 7L * 86400
    def intervals: DataFrame = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= "1995-03-01" && col("o_orderdate") < "1995-04-01")
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("lo"),
        (unix_timestamp(col("o_orderdate")) + Week).as("hi"))
    def points: DataFrame = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= "1995-03-01" && col("l_shipdate") < "1995-04-08")
      .select(unix_timestamp(col("l_shipdate")).as("p"), col("l_quantity"))

    // JVM/IO warmup on an unrelated shape
    timeIt("warmup_scan_count", 2)(
      Tables.lineitem(spark, dir).groupBy("l_returnflag").count())

    // additive floors: what the scans + filters cost with a trivial agg
    timeIt("floor_lineitem_filter", 5)(points.agg(count(lit(1))))
    timeIt("floor_orders_filter", 5)(intervals.agg(count(lit(1))))

    // bin prep in isolation: the interval explode and the point binning
    timeIt("bin_intervals_only", 5)(
      intervals.filter(col("hi") > col("lo"))
        .withColumn("__bin", explode(sequence(
          floor(col("lo") / Week), floor((col("hi") - 1) / Week))))
        .agg(count(lit(1))))
    timeIt("bin_points_only", 5)(
      points.withColumn("__bin", floor(col("p") / Week)).agg(count(lit(1))))

    // the join without the final groupBy (isolates agg cost)
    timeIt("join_no_agg", 5)(
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", Week)
        .agg(count(lit(1))))

    // the full oracled query
    timeIt("q62_full", 5)(RangeJoin.q62RangeJoin(spark, dir))

    // variant: force-broadcast the binned interval side (~4k rows at
    // sf0.1) in case the planner picks a shuffle join
    timeIt("q62_bcast_intervals", 5) {
      val b = intervals.filter(col("hi") > col("lo"))
        .withColumn("__graft_bin", explode(sequence(
          floor(col("lo") / Week), floor((col("hi") - 1) / Week))))
      points.withColumn("__graft_bin", floor(col("p") / Week))
        .join(broadcast(b), Seq("__graft_bin"))
        .filter(col("p") >= col("lo") && col("p") < col("hi"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped_in_week"),
          round(sum("l_quantity"), 2).as("total_qty"))
    }

    // variant: no binning at all — broadcast nested-loop on the raw range
    // predicate (viable ONLY because this interval table is tiny; the
    // binned form exists for the case where it is not)
    timeIt("q62_bnlj_nobin", 5)(
      points.join(broadcast(intervals),
          col("p") >= col("lo") && col("p") < col("hi"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped_in_week"),
          round(sum("l_quantity"), 2).as("total_qty")))

    // variant: distributive-aggregate pushdown below the join — ship
    // dates have ~38 distinct values in the window, so pre-aggregating
    // points per day collapses the join from |points|×matches to
    // |days|×matches (~240× fewer joined rows at sf0.1), exactly
    timeIt("q62_preagg_points", 5) {
      val pAgg = points.groupBy("p")
        .agg(count(lit(1)).as("__n"), sum("l_quantity").as("__q"))
      RangeJoin.pointInInterval(pAgg, "p", intervals, "lo", "hi", Week)
        .groupBy("o_orderkey")
        .agg(sum("__n").as("n_shipped_in_week"),
          round(sum("__q"), 2).as("total_qty"))
    }

    // re-measure the full form LAST so JIT progression can't flatter the
    // variants (earlier probes warmed the shared kernels)
    timeIt("q62_full_again", 5)(RangeJoin.q62RangeJoin(spark, dir))

    // ... and the scan floors again, fully warm, so the floor-vs-full
    // comparison isn't skewed by the floors having run first (cold JIT)
    timeIt("floor_lineitem_again", 5)(points.agg(count(lit(1))))
    timeIt("floor_orders_again", 5)(intervals.agg(count(lit(1))))

    println("[q62probe] final plan:")
    RangeJoin.q62RangeJoin(spark, dir).explain("formatted")
    spark.stop()
  }
}
