package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.MediaOps
import graft.operators.{AsOfJoin, Lifecycle, Marts, Profiler, RangeJoin, TextOps, TopK, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.q05RegionalRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Marts.queries ++ Lifecycle.queries ++ TextOps.queries ++ VectorOps.queries ++
      MediaOps.queries ++ AsOfJoin.queries ++ TopK.queries ++ RangeJoin.queries ++
      Profiler.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Marts.oracles ++ Lifecycle.oracles ++ TextOps.oracles ++ VectorOps.oracles ++
      MediaOps.oracles ++ AsOfJoin.oracles ++ TopK.oracles ++ RangeJoin.oracles ++
      Profiler.oracles
}
