package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Silver/gold parquet layout writer. At 100 TB the physical layout IS
  * the query plan: partition columns give pruning, in-file ordering gives
  * min/max row-group skipping, and target file sizing avoids the
  * small-files problem that kills scan parallelism.
  */
object ParquetSink {

  /** Write with hive-style partitions, sorted within files so parquet
    * column statistics (min/max per row group) prune point/range reads.
    */
  /** One partition-clustered, stat-friendly physical ordering shared by
    * every partitioned write path. */
  private def layoutSorted(df: DataFrame, partitionCols: Seq[String],
      sortCols: Seq[String]): DataFrame =
    if (sortCols.isEmpty) df
    else df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    layoutSorted(df, partitionCols, sortCols).write
      .partitionBy(partitionCols: _*)
      .mode(mode)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: co-locates join keys at write time so
    * bucket-aligned joins/aggregations run with NO exchange — the
    * pre-shuffle trade that pays for itself on every repeated 100 TB
    * fact-fact join.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(mode)
      .format("parquet")
      .saveAsTable(table)

  /** Upsert-by-partition into an existing partitioned layout: overwrite
    * ONLY the partitions present in `df`, leave every other partition
    * untouched — the parquet-side MERGE a gold layer runs per refresh
    * (and the file twin of JdbcSink's overwrite-by-partition contract).
    * Uses Spark's dynamic partition-overwrite mode scoped to this one
    * write, so a daily job rewrites yesterday's partition without
    * touching (or reading) years of history.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit =
    layoutSorted(df, partitionCols, sortCols).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
}
