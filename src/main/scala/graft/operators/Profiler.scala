package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality profiling: per-column null counts, exact distinct counts,
  * and value ranges — the table-health report a lakehouse publishes next
  * to every mart (the reference's silver "basic cleaning" stage implies
  * exactly this visibility; finnoio/jobhouse docs/Pipeline
  * Architecture.mermaid, silver subgraph).
  *
  * Shape for scale: ONE aggregation pass over the table computes every
  * column's stats together (the multi-distinct plans as a single Expand +
  * shuffle, not one scan per column); the per-column rows are then peeled
  * off the single aggregate row with driver-side unions of 1-row
  * projections — free at any table size.
  */
object Profiler {

  /** Numeric-column profile: one row per column. The aggregate row is
    * collected once and the per-column rows built driver-side — a union
    * of projections over the aggregate would re-plan (and re-scan) the
    * aggregation once per column, because column pruning gives each
    * branch a different pruned Aggregate that exchange reuse can't
    * dedupe. Collecting ONE row is free at any table size and keeps the
    * single-pass promise literal.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"nulls__$c"),
        countDistinct(col(c)).as(s"dist__$c"),
        min(col(c)).cast("double").as(s"min__$c"),
        max(col(c)).cast("double").as(s"max__$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def grab[A](name: String): A = row.getAs[A](name)
    val out = cols.map { c =>
      (c, grab[Long]("n_rows"), grab[Long](s"nulls__$c"), grab[Long](s"dist__$c"),
        Option(row.getAs[Any](s"min__$c")).map(_.asInstanceOf[Double]),
        Option(row.getAs[Any](s"max__$c")).map(_.asInstanceOf[Double]))
    }
    import df.sparkSession.implicits._
    out.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")
  }

  def q71Profile(s: SparkSession, d: String): DataFrame =
    profile(Tables.orders(s, d), Seq("o_orderkey", "o_custkey", "o_totalprice"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_profile" -> q71Profile _,
  )

  val oracles: Map[String, String] = Map(
    "q71_profile" -> Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"),
  )
}
