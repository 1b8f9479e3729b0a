package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.TopKPerKeyPlan
import graft.sources.Tables

/** Public surface of the custom grouped-top-k operator
  * (graft.plans.TopKPerKey): exact per-key top-k with bounded heaps
  * instead of Spark's full window sort.
  */
object TopK {

  /** orderExpr ranks rows (e.g. `struct(col("a"), col("b"))` for
    * composite keys); ties resolved only if it is unique per row.
    *
    * Requires the session to carry [[graft.GraftExtensions]] (which
    * injects `TopKPerKeyStrategy`) — the config-only packaging a real
    * cluster deployment uses; no `spark.experimental` mutation here.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderExpr: Column,
      descending: Boolean, k: Int): DataFrame = {
    val spark = df.sparkSession
    val direction =
      if (descending) org.apache.spark.sql.catalyst.expressions.Descending
      else org.apache.spark.sql.catalyst.expressions.Ascending
    // Materialize the sort key as a column so the standard analyzer
    // resolves it; the custom node then only references resolved
    // attributes (lazy ColumnNode expressions can't codegen/serialize).
    val withOrd = df.withColumn("__graft_ord", orderExpr)
    val childPlan = ColumnBridge.analyzed(withOrd)
    def attr(n: String) = childPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${df.columns.mkString(",")}"))
    val plan = TopKPerKeyPlan(keys.map(attr),
      SortOrder(attr("__graft_ord"), direction), k, childPlan)
    ColumnBridge.ofRows(spark, plan).drop("__graft_ord")
  }

  /** Top-3 customers per segment by balance — same semantics as the
    * window row_number form, but planned as the custom heap operator.
    */
  def q54TopkPerKey(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    topKPerKey(c, Seq("c_mktsegment"),
      struct(col("c_acctbal"), col("c_custkey")), descending = true, k = 3)
      .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_topk_per_key" -> q54TopkPerKey _,
  )

  val oracles: Map[String, String] = Map(
    "q54_topk_per_key" ->
      """SELECT c_mktsegment, c_custkey, c_name, c_acctbal FROM (
        | SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        | FROM customer) t WHERE rn <= 3""".stripMargin,
  )
}
