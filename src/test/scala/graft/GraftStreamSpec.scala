package graft

import java.nio.file.Files

import graft.sources.ManifestTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** The manifest change feed as a Structured Streaming source: snapshot
  * bootstrap + per-commit tail, exactly-once across restart (version
  * offsets in the checkpoint), admission capping, and the loud
  * non-append-boundary failure.
  */
class GraftStreamSpec extends SparkSpec {

  test("readStream tails commits exactly-once, incl. across restart") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_stream").toString + "/t"
    val cp = Files.createTempDirectory("graft_stream_cp").toString
    // a RECOVERABLE sink (file sink), so the restart half actually
    // exercises the checkpointed version offset (memory sink refuses
    // checkpoint recovery)
    val out = Files.createTempDirectory("graft_stream_out").toString + "/out"

    ManifestTable.commit((1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      table, append = false, statsCols = Seq("id"))

    def startQuery() = spark.readStream.format("graft").load(table)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode(OutputMode.Append).start()

    val q = startQuery()
    try {
      q.processAllAvailable() // batch 0 = the bootstrap snapshot
      assert(spark.read.parquet(out).count() == 50)

      // two appends land while the stream runs: delivered once each
      ManifestTable.commit((51 to 60).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
        table, append = true, statsCols = Seq("id"))
      q.processAllAvailable()
      ManifestTable.commit((61 to 65).map(i => (i.toLong, s"c$i")).toDF("id", "v"),
        table, append = true, statsCols = Seq("id"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 65)
      assert(spark.read.parquet(out).select("id").distinct().count() == 65,
        "no commit may deliver twice")
    } finally q.stop()

    // a commit lands while the stream is DOWN; restart resumes from the
    // checkpointed version offset - the delivered commits do not replay
    ManifestTable.commit(Seq((66L, "d66")).toDF("id", "v"),
      table, append = true, statsCols = Seq("id"))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 66)
      assert(spark.read.parquet(out).select("id").distinct().count() == 66,
        "restart must deliver exactly the missed commit")
    } finally q2.stop()
  }

  test("maxVersionsPerBatch survives restart: offered floor restores from checkpoint") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_stream_cap").toString + "/t"
    val cp = Files.createTempDirectory("graft_stream_cap_cp").toString
    val out = Files.createTempDirectory("graft_stream_cap_out").toString + "/o"

    ManifestTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"),
      table, append = false)
    (2 to 5).foreach(k => ManifestTable.commit(
      Seq((k * 100L, "b")).toDF("id", "v"), table, append = true))

    def startCapped() = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(table)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode(OutputMode.Append).start()

    val q = startCapped()
    try {
      q.processAllAvailable() // drains v1..v5 in capped per-version batches
      assert(spark.read.parquet(out).count() == 14)
    } finally q.stop()

    // committed offset (5) is far past sinceVersion+cap (0+1): a restarted
    // source that reset its cap floor would offer an offset BELOW the
    // checkpoint and fail the query - the persisted floor must restore
    (6 to 8).foreach(k => ManifestTable.commit(
      Seq((k * 100L, "c")).toDF("id", "v"), table, append = true))
    val q2 = startCapped()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 17)
      assert(spark.read.parquet(out).select("id").distinct().count() == 17,
        "restart under an admission cap must not replay or skip")
      val batches = q2.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3 && batches.forall(_.numInputRows == 1),
        s"the cap must keep splitting after restart: " +
          batches.map(_.numInputRows).mkString(","))
    } finally q2.stop()
  }

  test("writeStream sink: the full lakehouse loop, exactly-once across restart") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_loop").toString + "/src"
    val dst = Files.createTempDirectory("graft_loop").toString + "/dst"
    val cp = Files.createTempDirectory("graft_loop_cp").toString

    ManifestTable.commit((1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      src, append = false, statsCols = Seq("id"))

    // graft -> transform -> graft: the change feed of one manifest table
    // lands (transformed) as idempotent commits of another
    def startLoop() = spark.readStream.format("graft").load(src)
      .withColumn("id2", org.apache.spark.sql.functions.col("id") * 2)
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", cp)
      .option("stats", "id").outputMode(OutputMode.Append).start()

    val q = startLoop()
    try {
      q.processAllAvailable() // bootstrap: sink table born from batch 0
      assert(spark.read.format("graft").load(dst).count() == 50)
      ManifestTable.commit((51 to 60).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
        src, append = true, statsCols = Seq("id"))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(dst).count() == 60)
    } finally q.stop()

    // commits land while the loop is DOWN; restart drains them once
    ManifestTable.commit((61 to 65).map(i => (i.toLong, s"c$i")).toDF("id", "v"),
      src, append = true, statsCols = Seq("id"))
    val q2 = startLoop()
    try {
      q2.processAllAvailable()
      val out = spark.read.format("graft").load(dst)
      assert(out.count() == 65)
      assert(out.select("id").distinct().count() == 65,
        "sink idempotence + source offsets: no commit delivers twice")
      assert(out.filter(col("id2") =!= col("id") * 2).count() == 0)
      // the sink's commits recorded the stats option's column
      val head = ManifestTable.currentVersion(spark, dst)
      assert(ManifestTable.manifestEntries(spark, dst, head)
        .forall(_.stats.contains("id")))
    } finally q2.stop()
  }

  test("writeStream sink: complete mode overwrites, update mode refused") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_agg").toString + "/src"
    val dst = Files.createTempDirectory("graft_agg").toString + "/dst"
    val cp = Files.createTempDirectory("graft_agg_cp").toString

    ManifestTable.commit((1 to 20).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "v"),
      src, append = false)

    // complete-mode aggregate: the sink table IS the current state
    val q = spark.readStream.format("graft").load(src)
      .groupBy("v").count()
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", cp)
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft").load(dst)
        .agg(org.apache.spark.sql.functions.sum("count")).head.getLong(0) == 20)
      val vAfterFirst = ManifestTable.currentVersion(spark, dst)
      ManifestTable.commit(Seq((21L, "k0")).toDF("id", "v"), src, append = true)
      q.processAllAvailable()
      val out = spark.read.format("graft").load(dst)
      assert(out.agg(org.apache.spark.sql.functions.sum("count")).head.getLong(0) == 21,
        "complete mode must replace the snapshot with the new aggregate state")
      assert(out.count() == 3, "one row per group, not accumulated batches")
      assert(ManifestTable.currentVersion(spark, dst) > vAfterFirst,
        "each batch is a new overwrite commit; history time-travels")
    } finally q.stop()

    // update mode has no commit form
    val upd = intercept[Exception] {
      spark.readStream.format("graft").load(src)
        .groupBy("v").count()
        .writeStream.format("graft")
        .option("path", dst + "2")
        .option("checkpointLocation", cp + "2")
        .outputMode(OutputMode.Update).start()
    }
    assert(upd.getMessage.contains("no commit form"), upd.getMessage)
  }

  test("sinceVersion tail, maxVersionsPerBatch admission, boundary failure") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_stream2").toString + "/t"

    ManifestTable.commit((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"),
      table, append = false)
    (2 to 5).foreach(k => ManifestTable.commit(
      Seq((k * 100L, "b")).toDF("id", "v"), table, append = true))
    // head is now v5: 10 + 4 rows

    // sinceVersion 1 = tail AFTER the bootstrap snapshot; one version
    // per micro-batch = 4 batches of exactly one commit each
    val cp = Files.createTempDirectory("graft_stream2_cp").toString
    val q = spark.readStream.format("graft")
      .option("sinceVersion", "1").option("maxVersionsPerBatch", "1")
      .load(table)
      .writeStream.format("memory").queryName("tail2")
      .option("checkpointLocation", cp).outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM tail2").head.getLong(0) == 4)
      assert(spark.sql("SELECT min(id) FROM tail2").head.getLong(0) == 200L)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4,
        s"admission cap must split the backlog into per-commit batches: " +
          batches.map(_.numInputRows).mkString(","))
    } finally q.stop()

    // a compaction rewrites dirs mid-stream: the next batch must fail
    // with the re-bootstrap contract, not double-deliver
    val cp3 = Files.createTempDirectory("graft_stream3_cp").toString
    val q3 = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("tail3")
      .option("checkpointLocation", cp3).outputMode(OutputMode.Append).start()
    try {
      q3.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM tail3").head.getLong(0) == 14)
      ManifestTable.compactCommit(spark, table, targetBytes = 1L << 20)
      ManifestTable.commit(Seq((999L, "z")).toDF("id", "v"), table, append = true)
      val boundary = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
        q3.awaitTermination(30000)
      }
      assert(boundary.getMessage.contains("re-bootstrap") ||
        Option(boundary.getCause).exists(_.getMessage.contains("re-bootstrap")),
        boundary.getMessage)
    } finally q3.stop()

    // stream options are validated: version pins and unborn tables refuse
    val pin = intercept[Exception](spark.readStream.format("graft")
      .option("version", "2").load(table))
    assert(pin.getMessage.contains("batch read option"), pin.getMessage)
    // a sinceVersion past the head would not fail a stream - it would
    // silently deliver nothing forever; refuse like the batch surface
    val past = intercept[Exception](spark.readStream.format("graft")
      .option("sinceVersion", "99").load(table))
    assert(past.getMessage.contains("past the head"), past.getMessage)
    val unborn = intercept[Exception](spark.readStream.format("graft")
      .load(table + "_nope"))
    assert(unborn.getMessage.contains("no committed version"), unborn.getMessage)
  }
}
