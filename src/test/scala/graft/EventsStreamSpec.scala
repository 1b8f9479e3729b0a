package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

class EventsStreamSpec extends SparkSpec {

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("windowedCounts over a MemoryStream emits finalized hourly windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventsStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("00:10"), 1, "click", 1.0),
        Event(2, ts("00:20"), 2, "click", 2.0),
        Event(3, ts("00:40"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the 00:00 window + watermark
      input.addData(Event(4, ts("02:30"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts("03:30"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      val clicks = rows.find(r => r.getAs[String]("event_type") == "click")
      assert(clicks.isDefined, s"no finalized click window in ${rows.mkString(";")}")
      assert(clicks.get.getAs[Long]("n_events") == 2)
      assert(clicks.get.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on 30-min gaps (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append).start()
    try {
      // session A: 2 events 10 min apart; then 40-min gap → session B
      input.addData(
        Event(1, ts("00:00"), 7, "click", 1.0),
        Event(2, ts("00:10"), 7, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("00:50"), 7, "click", 5.0))
      q.processAllAvailable()
      // push watermark far ahead so the timeout fires and closes B too
      input.addData(Event(4, ts("05:00"), 9, "click", 0.5))
      q.processAllAvailable()
      input.addData(Event(5, ts("09:00"), 9, "click", 0.5))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .filter(_.getAs[Long]("user_id") == 7L)
      assert(rows.length == 2, s"expected 2 closed sessions, got ${rows.mkString(";")}")
      val a = rows.minBy(_.getAs[Timestamp]("session_start").getTime)
      val b = rows.maxBy(_.getAs[Timestamp]("session_start").getTime)
      assert(a.getAs[Long]("n_events") == 2 && a.getAs[Double]("total_value") == 3.0)
      assert(b.getAs[Long]("n_events") == 1 && b.getAs[Double]("total_value") == 5.0)
    } finally q.stop()
  }

  test("late-but-admitted event does not rewind the session frontier") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_late").outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts("00:00"), 5, "click", 1.0),
        Event(2, ts("00:20"), 5, "view", 1.0))
      q.processAllAvailable()
      // late event (admitted: after watermark) arrives out of order
      input.addData(Event(3, ts("00:15"), 5, "click", 1.0))
      q.processAllAvailable()
      // 28 min after the TRUE frontier (00:20) → must merge, not split
      input.addData(Event(4, ts("00:48"), 5, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts("04:00"), 6, "click", 0.1))
      q.processAllAvailable()
      input.addData(Event(6, ts("08:00"), 6, "click", 0.1))
      q.processAllAvailable()
      val rows = spark.table("sess_late").collect().filter(_.getAs[Long]("user_id") == 5L)
      assert(rows.length == 1, s"session split on late event: ${rows.mkString(";")}")
      assert(rows.head.getAs[Long]("n_events") == 4)
    } finally q.stop()
  }

  test("streaming dedup gate drops re-delivered events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventsStream.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_gate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("00:00"), 1, "click", 1.0),
        Event(2, ts("00:01"), 1, "view", 2.0),
        Event(1, ts("00:00"), 1, "click", 1.0)) // dup in same batch
      q.processAllAvailable()
      input.addData(Event(2, ts("00:02"), 1, "view", 2.0)) // redelivery next batch
      q.processAllAvailable()
      assert(spark.table("dedup_gate").count() == 2)
    } finally q.stop()
  }

  test("windowedCounts is batch/stream agnostic (same result on a batch frame)") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts("00:10"), 1, "click", 1.0),
      Event(2, ts("00:20"), 2, "click", 2.0)).toDF()
    val rows = EventsStream.windowedCounts(batch).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_events") == 2)
  }

  test("stream-stream attribution join pairs purchases with in-window views only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventsStream.attributionJoin(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Event(10, ts("00:00"), 1, "view", 0.0),   // in window for the 00:30 purchase
        Event(11, ts("00:10"), 2, "view", 0.0),   // other user - never joins
        Event(12, ts("02:00"), 1, "view", 0.0),   // after the purchase - never joins
        // >1h BEFORE the purchase - rejected by the upper bound, the
        // condition that makes the join's state expirable
        Event(13, Timestamp.valueOf("2023-12-31 23:00:00"), 1, "view", 0.0))
      purchases.addData(
        Event(20, ts("00:30"), 1, "purchase", 9.99))
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
      assert(rows.length == 1, s"exactly one attribution, got ${rows.mkString(";")}")
      val r = rows.head
      assert(r.getAs[Long]("user_id") == 1L)
      assert(r.getAs[Long]("view_id") == 10L && r.getAs[Long]("purchase_id") == 20L)
      assert(r.getAs[Double]("value") == 9.99)
    } finally q.stop()
  }
}
