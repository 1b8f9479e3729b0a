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

  test("map-side partial top-k bounds shuffle rows to partitions x keys x k") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // skewed: 4 input partitions x 2 keys x 500 rows; without the
      // partial phase the exchange would carry all 4000 rows
      val df = (1 to 4000).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
        .toDF("k", "v").repartition(4)
      val top = TopK.topKPerKey(df, Seq("k"), col("v"), descending = true, k = 3)
      val got = top.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("a", 4000L), ("a", 3998L), ("a", 3996L),
        ("b", 3999L), ("b", 3997L), ("b", 3995L)))
      val shuffled = top.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.metrics("shuffleRecordsWritten").value
      }
      assert(shuffled.nonEmpty, "expected a key-clustered exchange in the plan")
      // the repartition(4) exchange carries 4000 rows; the top-k exchange
      // must carry at most 4 partitions x 2 keys x 3 = 24 survivor rows
      assert(shuffled.min <= 24,
        s"partial phase did not bound the shuffle: records per exchange = $shuffled")
      val plan = top.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyPartial"), s"partial node missing:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("extensions: native functions reach SQL with no register() call") {
    import spark.implicits._
    // SparkSpec's session carries GraftExtensions — the same wiring a
    // cluster gets from spark.sql.extensions=graft.GraftExtensions
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(0.0, 2.0), Seq(2.0, 0.0)))
      .toDF("a", "b").createOrReplaceTempView("ext_vecs")
    val cos = spark.sql("SELECT round(vec_cosine(a, b), 6) AS c FROM ext_vecs")
      .collect().map(_.getDouble(0)).sorted
    assert(cos.sameElements(Array(0.0, 1.0)))
    assert(spark.sql("SELECT vec_norm(array(3.0d, 4.0d)) AS n").head().getDouble(0) == 5.0)
    assert(spark.sql("SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    val sh = spark.sql("SELECT simhash64(array('alpha','beta')) AS s").head().getLong(0)
    assert(sh != 0L)
    assert(spark.sql("SELECT shingles(array('a','b','c'), 2) AS g").head()
      .getSeq[String](0) == Seq("a b", "b c"))
    val hh = spark.sql(
      "SELECT topk_freq(w, 1, 16) AS t FROM (SELECT explode(array('x','x','y')) AS w)")
      .select(explode(col("t")).as("e")).select("e.word", "e.cnt").head()
    assert(hh.getString(0) == "x" && hh.getLong(1) == 2L)
    assert(spark.sql(
      "SELECT kmv_sketch(h, 2) AS s FROM (SELECT explode(array(9L,4L,7L,4L)) AS h)")
      .head().getSeq[Long](0) == Seq(4L, 7L))
    // the config-string path: the class must instantiate by name and apply
    val inst = Class.forName("graft.GraftExtensions").getDeclaredConstructor()
      .newInstance().asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    inst(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("ascending mode returns the k smallest") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
    val got = TopK.topKPerKey(df, Seq("k"), col("v"), descending = false, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }
}
