package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest — the reference schedules a daily batch pull via
  * Airflow (finnoio/jobhouse dags/extract_raw_jobs.py); the Spark-native
  * shape is Structured Streaming over the same event schema: watermarked
  * tumbling-window marts plus stateful sessionization.
  *
  * windowedCounts and dedupStream run identically over `readStream`
  * sources and batch frames; the sessionizer is streaming-only (its
  * sessions close on event-time timeouts) — its batch twin is
  * operators.Lifecycle.q26Sessionize.
  */
object EventsStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long,
      totalValue: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      n_events: Long, total_value: Double)

  /** Watermarked tumbling-window counts per event type. On a stream this
    * emits append-mode finalized windows; late events beyond 10 min are
    * dropped at the watermark, bounding state. (Unlike the sessionizer
    * below, this transform IS batch/stream agnostic — window aggregation
    * needs no timeout to finalize in batch mode.)
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))

  /** Streaming dedup gate: drop re-delivered events by id within the
    * watermark horizon — the streaming twin of Lifecycle.dedupGate (the
    * reference's metadata dedup check), with state bounded by the
    * watermark instead of growing forever.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: attribute each purchase to
    * the views by the same user in the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire buffered state — the requirements for a
    * stream-stream join that runs forever without growing. The batch
    * twin of the same shape is `operators.AsOfJoin` / `RangeJoin`.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    v.join(p, expr(
      """v_user = p_user AND
        |purchase_ts >= view_ts AND
        |purchase_ts <= view_ts + INTERVAL 1 HOUR""".stripMargin))
      .select(col("p_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("view_ts"), col("purchase_ts"), col("value"))
  }

  private val GapMs = 30L * 60 * 1000

  /** Stateful sessionizer: 30-min-gap sessions per user, state expired via
    * event-time timeout so state size is O(active users), not O(history).
    *
    * STREAMING-ONLY: sessions close on the event-time timeout, which never
    * fires in batch execution — a batch run would drop each user's trailing
    * session. The batch twin is operators.Lifecycle.q26Sessionize.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart), s.nEvents, s.totalValue))
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= GapMs =>
                  // late-but-admitted events must not rewind the session
                  // frontier or we split sessions on the next event
                  cur = Some(s.copy(
                    sessionStart = math.min(t, s.sessionStart),
                    lastTs = math.max(t, s.lastTs),
                    nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.sessionStart), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + GapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
