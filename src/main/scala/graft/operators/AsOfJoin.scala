package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and right.time <= left.time.
  *
  * Spark has no ASOF JOIN; the naive formulation (range join + per-key
  * max) explodes to |L|x|R| per key. This is the scalable shape: union
  * both sides, one shuffle on the key, and a running `last(_, ignoreNulls)`
  * window ordered by (time, side) — right rows sort before left rows at
  * equal timestamps, giving <= semantics. O(|L|+|R|) rows, one exchange,
  * no join at all.
  */
object AsOfJoin {

  /** leftTime/rightTime must be comparable columns named `time` after
    * selection; payload columns of the right side arrive as a struct that
    * is null when no prior right row exists (LEFT asof semantics).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val payload = struct(rightPayload.map(col): _*)
    // SQL ASOF semantics: left.t >= NULL is never true, so null-time
    // right rows can never match (they'd otherwise sort first and leak
    // their payload to every early left row)
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), payload.as("__payload"))
    val leftCols = left.columns
    val l = left.select(
      (Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col)): _*)
    val combined = l.unionByName(
      r.select((r.columns.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      // SQL join semantics: NULL keys never match (the null window
      // partition would otherwise pair null-key rows with each other)
      .withColumn("__match",
        when(col("__k").isNotNull,
          last("__payload", ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__match"): _*)
  }

  /** Attribution mart: each purchase event joined to the user's most
    * recent click at-or-before it.
    */
  def q45AsofAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    // dedupe right side to one click per (user, ts) so tie-breaking is
    // engine-independent
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_event_id"))
    asof(purchases, clicks, "user_id", "ts", "ts", Seq("click_event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("__match.click_event_id").as("click_event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_asof_attribution" -> q45AsofAttribution _,
  )

  val oracles: Map[String, String] = Map(
    "q45_asof_attribution" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type='purchase'),
        | clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type='click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.value, c.click_event_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
  )
}
