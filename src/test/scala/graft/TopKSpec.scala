package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TopK
import graft.sources.Tables

class TopKSpec extends SparkSpec {

  test("custom operator result equals the window row_number formulation") {
    val c = Tables.customer(spark, sfDir)
    val custom = TopK.topKPerKey(c, Seq("c_mktsegment"),
        struct(col("c_acctbal"), col("c_custkey")), descending = true, k = 3)
      .select("c_mktsegment", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").desc)
    val reference = c.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("c_mktsegment", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == reference)
  }

  test("plans as TopKPerKeyExec with a key-clustered exchange, no sort") {
    val c = Tables.customer(spark, sfDir)
    val df = TopK.topKPerKey(c, Seq("c_mktsegment"), col("c_acctbal"),
      descending = true, k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Sort "), s"unexpected full sort:\n$plan")
  }

  test("ascending mode returns the k smallest") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
    val got = TopK.topKPerKey(df, Seq("k"), col("v"), descending = false, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }
}
