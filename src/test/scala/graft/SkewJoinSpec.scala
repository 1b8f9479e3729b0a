package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, SkewJoin}

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(large, small, "k", salt = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(salted.count(_.contains("hot")) == 1800)
  }

  test("AQE splits a skewed sort-merge join at runtime (unplanned-skew path)") {
    import spark.implicits._
    // saltedJoin covers skew you PLAN for; this pins down the config-only
    // path a cluster run leans on when skew shows up at runtime: AQE must
    // recognize the oversized shuffle partition and split it.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = ((1 to 60000).map(i => (7L, s"payload-$i-$i-$i")) ++
        (1L to 40L).map(k => (k, "cold"))).toDF("k", "v")
      val right = (1L to 40L).map(k => (k, k * 2)).toDF("k", "w")
      val joined = left.join(right, "k")
      // execute THIS frame: count() would spin up its own query execution
      // and leave joined's adaptive plan unfinalized
      assert(joined.collect().length == 60040)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition as skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("asof join picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "time", "tag")
    val right = Seq((1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 201L, "c3"), (2L, 60L, "c4"))
      .toDF("k", "time", "click")
    val got = AsOfJoin.asof(left, right, "k", "time", "time", Seq("click"))
      .select(col("tag"), col("__match.click").as("click"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("p1").contains("c2")) // ties: right at equal time matches (<=)
    assert(got("p2").contains("c3")) // latest before 205
    assert(got("p3").isEmpty)        // right row is after left time → null
  }
}
