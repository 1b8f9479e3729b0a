package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.sources.BatchRunner

class BatchRunnerSpec extends SparkSpec {

  test("killed run resumes with exactly-once batch processing") {
    val bronze = Files.createTempDirectory("graft_bronze").toString
    val ledger = Files.createTempDirectory("graft_ledger").toString
    writeRawBatch(bronze, "b1", Seq("p1", "p2"))
    writeRawBatch(bronze, "b2", Seq("p3"))
    writeRawBatch(bronze, "b3", Seq("p4", "p5", "p6"))

    val seen = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    // run 1 "dies" on b2 every attempt — b1/b3 complete, b2 leaves no marker
    val r1 = BatchRunner.run(spark, bronze, ledger, retries = 0) { (b, df: DataFrame) =>
      if (b == "b2") throw new RuntimeException("injected mid-run failure")
      assert(df.select("batch_id").distinct().collect().map(_.getString(0)).toSeq == Seq(b),
        "job must only see its own batch")
      seen(b) += 1
    }
    assert(r1.processed == Seq("b1", "b3") && r1.failed == Seq("b2") && r1.skipped.isEmpty)
    assert(BatchRunner.processedBatches(spark, ledger) == Set("b1", "b3"))

    // run 2 resumes: only the unfinished batch runs, completed ones skip
    val r2 = BatchRunner.run(spark, bronze, ledger, retries = 0) { (b, _) => seen(b) += 1 }
    assert(r2.processed == Seq("b2") && r2.skipped == Seq("b1", "b3") && r2.failed.isEmpty)
    assert(seen.toMap == Map("b1" -> 1, "b2" -> 1, "b3" -> 1),
      s"every batch exactly once, got $seen")

    // run 3 is a no-op
    val r3 = BatchRunner.run(spark, bronze, ledger, retries = 0) { (b, _) => seen(b) += 1 }
    assert(r3.processed.isEmpty && r3.skipped.size == 3)
    assert(seen.values.forall(_ == 1))
  }

  test("per-batch retries: flaky job succeeds within the retry budget") {
    val bronze = Files.createTempDirectory("graft_bronze2").toString
    val ledger = Files.createTempDirectory("graft_ledger2").toString
    writeRawBatch(bronze, "flaky", Seq("p1"))
    var attempts = 0
    val r = BatchRunner.run(spark, bronze, ledger, retries = 3) { (_, _) =>
      attempts += 1
      if (attempts < 3) throw new RuntimeException(s"transient #$attempts")
    }
    assert(r.processed == Seq("flaky") && attempts == 3)
  }
}
