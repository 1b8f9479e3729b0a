package graft

import org.apache.spark.sql.functions._
import graft.operators.{Lifecycle, TextOps}

class LifecycleSpec extends SparkSpec {

  test("cdcDiff classifies insert/update/delete and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "status", "price")
    val neu = Seq((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "status", "price")
    val got = Lifecycle.cdcDiff(old, neu, "id", Seq("status", "price"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
    assert(got == Map(1L -> "delete", 2L -> "update", 4L -> "insert"))
  }

  test("cdcDiff treats null values with null-safe equality") {
    import spark.implicits._
    val old = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("id", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val got = Lifecycle.cdcDiff(old, neu, "id", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
    assert(got == Map(2L -> "update")) // null==null is unchanged, x→null is update
  }

  test("dedupGate passes only unseen keys") {
    import spark.implicits._
    val incoming = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val seen = Seq(Tuple1(2L)).toDF("k")
    val got = Lifecycle.dedupGate(incoming, seen, "k")
      .collect().map(_.getAs[Long]("k")).sorted
    assert(got.sameElements(Array(1L, 3L)))
  }

  test("dedupGate join shape: the seen-store never shuffles, even with auto-broadcast off") {
    // file-backed gate (q25) so size estimates are real; the naive
    // incoming-ANTI-seen direction hash-builds on the store and falls to
    // SortMergeJoin once broadcast is ruled out - the scan-shape gate
    // must keep the store on a broadcast-probe plan by construction
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = Lifecycle.q25DedupIngestGate(spark, sfDir)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"store-side join must stay a broadcast probe:\n$plan")
      assert(gated.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("fingerprint collapses whitespace/case variants, separates content") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "  hello\tworld "),
      (4L, "goodbye world"),
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L))
    assert(fps(1L) != fps(4L))
  }

  test("scd2Merge closes open intervals and equals the full rebuild") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ev(rows: Seq[(Long, Long, String)]) =
      rows.toDF("user_id", "event_id", "t")
        .select(col("user_id"), col("event_id"), to_timestamp(col("t")).as("ts"))
    val history = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (1L, 2L, "2024-01-05 10:00:00"),
      (2L, 3L, "2024-01-02 10:00:00")))
    val updates = ev(Seq(
      (1L, 4L, "2024-01-20 10:00:00"),   // existing user: closes event 2
      (3L, 5L, "2024-01-21 10:00:00")))  // brand-new user
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet

    val merged = graft.operators.Lifecycle.scd2Merge(
      graft.operators.Lifecycle.scd2Rebuild(history), updates)
    val rebuilt = graft.operators.Lifecycle.scd2Rebuild(history.unionByName(updates))
    assert(key(merged) == key(rebuilt), "merge must equal the full rebuild")
    // user 2 saw no updates: its open interval stays open
    val open = merged.filter(col("is_current")).select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(open == Map(1L -> 4L, 2L -> 3L, 3L -> 5L))
  }
}
