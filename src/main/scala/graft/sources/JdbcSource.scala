package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Serving-table reader — the read twin of [[JdbcSink]]: a mart loaded
  * into the serving database comes back as a DataFrame with the scan
  * fanned out across executors. The numeric partition column's [min,max]
  * is probed on one driver connection, then Spark's JDBC source splits
  * that range into `numPartitions` predicate-bounded slices, so a large
  * table streams through N parallel connections instead of one cursor.
  * (Slice sizes are range-proportional, not row-proportional — pick an
  * id-like column with roughly uniform density, the same advice as any
  * Spark JDBC read.)
  */
object JdbcSource {

  def read(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int = 8): DataFrame = {
    require(numPartitions > 0)
    require(table.matches("[A-Za-z][A-Za-z0-9_]*") &&
      partitionCol.matches("[A-Za-z][A-Za-z0-9_]*"),
      "table and partitionCol must be plain identifiers")
    val c = DriverManager.getConnection(url)
    val bounds =
      try {
        val rs = c.createStatement().executeQuery(
          s"SELECT MIN($partitionCol), MAX($partitionCol) FROM $table")
        rs.next()
        val lo = rs.getLong(1); val loNull = rs.wasNull()
        val hi = rs.getLong(2)
        if (loNull) None else Some((lo, hi))
      } finally c.close()
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    bounds match {
      case Some((lo, hi)) if hi > lo =>
        base
          .option("partitionColumn", partitionCol)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", numPartitions)
          .load()
      case _ => base.load() // empty or single-valued: one slice is correct
    }
  }
}
