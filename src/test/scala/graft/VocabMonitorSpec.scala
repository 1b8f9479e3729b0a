package graft

import java.nio.file.Files

import graft.streaming.VocabMonitor

class VocabMonitorSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("growth reads exactly in the sub-k regime; re-ingest of seen content reads zero") {
    val dir = Files.createTempDirectory("graft_vocab").toString
    val (store, log) = (s"$dir/store", s"$dir/log")
    // batch 1: 'a b c d' + 'b c d e' → distinct trigrams {abc,bcd,cde,bcd? }
    //  'a b c d' → {a b c, b c d}; 'b c d e' → {b c d, c d e} → 3 distinct
    val r1 = VocabMonitor.record(docs("a b c d", "b c d e"), store, log,
      "b1", k = 64).collect()(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ==
      ((3L, 0L, 3L, 3L)), s"got $r1")
    // batch 2: verbatim re-crawl — the freshness signal is growth 0
    val r2 = VocabMonitor.record(docs("a b c d"), store, log, "b2", k = 64)
      .collect()(0)
    assert(r2.getLong(4) == 0L, "re-ingested content must not grow the vocab")
    // batch 3: one genuinely new trigram
    val r3 = VocabMonitor.record(docs("x y z"), store, log, "b3", k = 64)
      .collect()(0)
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3), r3.getLong(4)) ==
      ((1L, 3L, 4L, 1L)))
    // the log accumulated all three rows
    assert(spark.read.parquet(log).count() == 3)
  }

  test("batch-boundary independence: any split of the same history converges to one sketch") {
    val dir = Files.createTempDirectory("graft_vocab2").toString
    val texts = (0 until 30).map(i =>
      (0 until 8).map(j => s"w${(i * 3 + j) % 40}").mkString(" "))
    // one big batch vs three uneven batches, k small enough to bind
    VocabMonitor.record(docs(texts: _*), s"$dir/a_store", s"$dir/a_log",
      "all", k = 8)
    VocabMonitor.record(docs(texts.take(5): _*), s"$dir/b_store", s"$dir/b_log", "p1", k = 8)
    VocabMonitor.record(docs(texts.slice(5, 6): _*), s"$dir/b_store", s"$dir/b_log", "p2", k = 8)
    VocabMonitor.record(docs(texts.drop(6): _*), s"$dir/b_store", s"$dir/b_log", "p3", k = 8)
    val a = spark.read.parquet(s"$dir/a_store").collect()(0)
      .getAs[scala.collection.Seq[Long]](1)
    val b = spark.read.parquet(s"$dir/b_store").collect()(0)
      .getAs[scala.collection.Seq[Long]](1)
    assert(a == b, "the sketch is a pure function of the ingested set")
    // and the final cumulative estimate matches regardless of the split
    val ea = spark.read.parquet(s"$dir/a_log").collect()(0).getLong(3)
    val eb = spark.read.parquet(s"$dir/b_log")
      .orderBy(org.apache.spark.sql.functions.col("batch_id").desc)
      .collect()(0).getLong(3)
    assert(ea == eb)
  }

  test("k is stamped in the store; a mismatched k refuses loudly; growth is monotone") {
    val dir = Files.createTempDirectory("graft_vocab3").toString
    val (store, log) = (s"$dir/store", s"$dir/log")
    VocabMonitor.record(docs("a b c d e f"), store, log, "b1", k = 4)
    val e = intercept[IllegalArgumentException](
      VocabMonitor.record(docs("g h i"), store, log, "b2", k = 8))
    assert(e.getMessage.contains("k=4"))
    // binding regime: minima only shrink, so est_after >= est_before
    var prev = 0L
    for (i <- 0 until 5) {
      val t = (0 until 20).map(j => s"v${i * 20 + j}").mkString(" ")
      val r = VocabMonitor.record(docs(t), store, log, s"g$i", k = 4)
        .collect()(0)
      assert(r.getLong(3) >= prev, "cumulative estimate must be monotone")
      prev = r.getLong(3)
    }
  }
}
