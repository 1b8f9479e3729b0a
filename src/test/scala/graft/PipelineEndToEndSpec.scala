package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** The whole curation pipeline, chained over live data — the "a user of
  * the reference could run their entire workload here" demonstration:
  * exact dedup → near-dup closure with quality-aware survivors →
  * √-temperature source rebalance → per-source token budget →
  * curriculum binning → corpus shuffle. Asserts the invariants that make
  * the chain trustworthy end to end: monotone survivor sets, permutation
  * ranks, near-equal curriculum bins, and full determinism under input
  * repartitioning.
  */
class PipelineEndToEndSpec extends SparkSpec {

  private def runChain(docs: DataFrame): (Seq[Long], Seq[Long], Seq[Long], DataFrame, Long) = {
    // 1. exact dedup: one survivor per fingerprint (min id)
    val exact = docs.groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
    val d1 = docs.join(exact.select("doc_id"), "doc_id")

    // 2. near-dup closure mined ONCE (labels materialized), then both
    //    views of it — the survivor selection AND the non-keeper count —
    //    read the labels, never re-mine (r15: the r14 verdict's item 1;
    //    the one-arg keepBestOn here would re-run the whole q94 closure)
    val labels = TextOps.dedupComponentsOn(d1).localCheckpoint(true)
    val nonKeepers = labels.filter(!col("is_keeper")).count()
    val keepers = TextOps.keepBestOn(labels, d1).select(col("keep_id").as("doc_id"))
    val d2 = d1.join(keepers, "doc_id")

    // 3. √-temperature source rebalance at 0.9
    val mixed = TextOps.sqrtTemperatureSample(d2, "source", 0.9)
    val d3 = d2.join(mixed.select("doc_id"), "doc_id")

    // 4. best 800 tokens per source
    val budgeted = TextOps.tokenBudgetSelect(d3, "source", 800L)
    val d4 = d3.join(budgeted.select("doc_id"), "doc_id")

    // 5. curriculum bins over the quality score, then 6. corpus shuffle
    val scored = d4.select(col("doc_id"),
      TextOps.qualityExpr(col("text")).as("quality"))
    val binned = TextOps.curriculumBins(scored, col("quality"), col("doc_id"), 5)
    val ranked = TextOps.shuffleRank(
      binned.select("doc_id", "bin"), col("doc_id"), "e2e:")

    (ids(d2), ids(d3), ids(d4), ranked, nonKeepers)
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("full curation chain: monotone survivors, permutation rank, balanced bins, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val n0 = docs.count()
    val (d2, d3, d4, ranked, nonKeepers) = runChain(docs)

    // monotone, nonempty, with real attrition by the budget stage
    assert(d2.size <= n0 && d3.size <= d2.size && d4.size <= d3.size)
    assert(d4.nonEmpty, "the chain must not zero out")
    assert(d4.size < n0, "the budget stage must actually select")
    assert(d3.toSet.subsetOf(d2.toSet) && d4.toSet.subsetOf(d3.toSet))

    // near-dup stage dropped the non-keepers the closure found — counted
    // from the chain's OWN materialized labels, not a second closure run
    assert(n0 - d2.size == nonKeepers,
      s"exact stage is lossless on this corpus; near-dup drops $nonKeepers")

    // final ranks are a permutation of 1..n over exactly the survivors
    val rows = ranked.collect()
    assert(rows.length == d4.size)
    assert(rows.map(_.getAs[Long]("shuffle_rank")).sorted
      .sameElements(1L to d4.size.toLong))
    // curriculum bins within one of each other
    val sizes = rows.groupBy(_.getAs[Long]("bin")).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"bin sizes: ${sizes.toSeq.sorted}")

    // the WHOLE chain is partitioning-independent
    val (e2, e3, e4, ranked2, _) = runChain(docs.repartition(7))
    assert(e2 == d2 && e3 == d3 && e4 == d4)
    val r1 = rows.map(r => (r.getLong(0), r.getAs[Long]("shuffle_rank"))).sorted
    val r2 = ranked2.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shuffle_rank"))).sorted
    assert(r1.sameElements(r2), "shuffle order must not depend on layout")
  }

  test("keepBestOn over precomputed labels: zero pair mining, identical survivors") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val labels = TextOps.dedupComponentsOn(docs).localCheckpoint(true)
    val viaLabels = TextOps.keepBestOn(labels, docs)
    // the labels-consuming plan touches the corpus exactly ONCE — the
    // quality scan; the closure's shingle mining and CC rounds are all
    // behind the materialized labels (a second FileScan here would mean
    // the chain pays the most expensive job in the suite twice)
    val plan = viaLabels.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1,
      s"labels-consuming keepBestOn must scan documents once, got $scans:\n$plan")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val a = rows(viaLabels)
    assert(a == rows(TextOps.keepBestOn(docs)),
      "the two overloads must agree exactly")
    assert(a.nonEmpty && a.exists(_._2 > 1L), "corpus must exercise real clusters")
    graft.CacheHygiene.release(labels)
  }

  test("embedding curation chain: quantization gate, semantic dedup, cluster-min invariant, deterministic") {
    import graft.operators.VectorOps
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")

    // 1. quantization diagnostics as the go/no-go gate: every vector
    //    must carry a real scale and not collapse to a zero code
    val diag = VectorOps.q106Int8Quantize(spark, "/root/testdata/sf0.01")
    val dRows = diag.collect()
    assert(dRows.length == emb.count())
    assert(dRows.forall(_.getAs[Long]("zero_dims") < 64L),
      "no vector may quantize to the all-zero code")
    // reconstruction stays under half a step everywhere → int8 is safe
    assert(dRows.forall(r =>
      r.getAs[Long]("max_err_pp9") <= r.getAs[Long]("scale_pp9") / 2 + 1))

    // 2. semantic dedup over the same corpus (k-means + keep-min-id)
    val sd = VectorOps.semDedup(emb, k = 8, iters = 2, tau = 0.3)
    val rows = sd.collect()
    val kept = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < rows.length,
      s"tau=0.3 must bind on this corpus (kept ${kept.size}/${rows.length})")

    // 3. the keep-min-id rule's structural invariant: a cluster's
    //    smallest id can never be dropped (nothing smaller exists to
    //    drop it), so every cluster survives curation with ≥1 member
    rows.groupBy(_.getLong(1)).foreach { case (c, members) =>
      assert(kept.contains(members.map(_.getLong(0)).min),
        s"cluster $c lost its min-id member")
    }

    // 4. whole chain is partitioning-independent
    val again = VectorOps.semDedup(emb.repartition(7), k = 8, iters = 2, tau = 0.3)
    assert(again.collect().map(_.toString).sorted
      .sameElements(rows.map(_.toString).sorted))
    graft.CacheHygiene.releaseTree(sd, again)
  }

  test("compressed-store chain: PQ geometry freeze, gated ingest, theta from the distortion card, drift read, vocab growth") {
    import graft.operators.PqDedupGate
    import graft.streaming.VocabMonitor
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e_pq").toString
    val (geom, store) = (s"$dir/geom", s"$dir/store")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")

    // 1. freeze the IVF-PQ geometry from the corpus itself
    PqDedupGate.writeGeometry(emb, geom, kc = 8, cIters = 2,
      m = 8, k = 16, iters = 2)

    // 2. θ comes FROM the persisted distortion card (the documented
    //    discipline): one power of two above the worst reference
    //    bucket, so a re-ingested vector (ADC = its own recon
    //    distortion) always refuses while staying far under the
    //    organic inter-vector floor at this corpus's dimensionality
    val maxBucket = spark.read.parquet(s"$geom/distortion")
      .agg(max("bucket")).collect()(0).getLong(0)
    val theta = 1L << (maxBucket + 1)

    // 3. ingest in two batches; the corpus has no code-level twins at
    //    this grid... unless it does — what matters is the CONTRACT:
    //    admitted ∪ refused = batch, and everything admitted landed
    val b1 = emb.filter(col("vec_id") < 2500)
    val b2 = emb.filter(col("vec_id") >= 2500)
    val n1 = PqDedupGate.ingest(b1, geom, store, theta).count()
    val n2 = PqDedupGate.ingest(b2, geom, store, theta).count()
    assert(n1 > 0 && n1 <= b1.count() && n2 <= b2.count())
    assert(PqDedupGate.readStore(spark, store).count() == n1 + n2)

    // 4. a verbatim re-crawl of batch 1 refuses WHOLESALE: every vector
    //    meets its own stored codes within its own distortion
    assert(PqDedupGate.gate(b1, geom, store, theta).count() == 0,
      "re-ingested vectors must gate out at a distortion-covering theta")

    // 5. the drift read on the re-crawl says stable, not rebuild
    val psi = PqDedupGate.distortionDrift(b1, geom).collect()(0).getDouble(2)
    assert(psi < 0.25, s"same-distribution re-crawl must not read rebuild, psi=$psi")

    // 6. vocabulary growth over the text corpus, split in two: the
    //    second half contributes, a re-crawl of the first does not
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val (vs, vl) = (s"$dir/vstore", s"$dir/vlog")
    val g1 = VocabMonitor.record(docs.filter(col("doc_id") < 250), vs, vl, "b1", k = 64)
      .collect()(0).getLong(4)
    val g2 = VocabMonitor.record(docs.filter(col("doc_id") >= 250), vs, vl, "b2", k = 64)
      .collect()(0).getLong(4)
    val g3 = VocabMonitor.record(docs.filter(col("doc_id") < 250), vs, vl, "b3", k = 64)
      .collect()(0).getLong(4)
    assert(g1 > 0 && g2 > 0, s"both fresh halves must grow the vocab ($g1, $g2)")
    assert(g3 == 0L, "the re-crawled half must read zero growth")
  }

  test("curation-to-objective chain: fused signals gate, keep-first scrub, FIM transform, pack") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n0 = docs.count()

    // 1. ONE fused scan produces every routing signal (q144): gate on
    //    quality >= 0.5 AND sane repetition — the bundle's columns, no
    //    second corpus read for any signal
    val signals = TextOps.signalBundle(docs).localCheckpoint(true)
    assert(signals.count() == n0, "the bundle keeps every doc")
    val keepIds = signals
      .filter(col("quality") >= 0.5 &&
        (col("rep3").isNull || col("rep3") <= 0.5))
      .select("doc_id")
    val kept = docs.join(keepIds, "doc_id").localCheckpoint(true)
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0, s"gate must pass a nonempty subset ($n1/$n0)")

    // 2. keep-first substring scrub over the survivors: token
    //    conservation per doc, first copies intact (n_removed=0 rows
    //    exist — the corpus HAS planted near-dups, someone must win)
    val scrubbed = TextOps.keepFirstScrub(kept).localCheckpoint(true)
    assert(scrubbed.count() == n1, "scrub keeps every doc row")
    val badTok = scrubbed.filter(
      size(split(col("text_clean"), "\\s+")) =!=
        (col("n_tokens") - col("n_removed")) && col("n_removed") < col("n_tokens"))
    assert(badTok.count() == 0, "token conservation: kept = total - removed")
    assert(scrubbed.filter(col("n_removed") === 0).count() > 0,
      "keep-first must leave winners untouched")

    // 3. FIM transform consumes the scrubbed text directly (the
    //    rename is the whole adapter — contract compatibility)
    val fim = TextOps.fimTransform(
      scrubbed.select(col("doc_id"), col("text_clean").as("text")))
    val modes = fim.groupBy("mode").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(modes.values.sum == n1, "one objective row per doc")
    assert(modes.getOrElse("psm", 0L) > 0, s"hash rate must select PSM docs: $modes")

    // 4. pack the transformed rows (lang rejoined from the source —
    //    packing is language-sharded): every row lands in a pack
    val packed = TextOps.packOn(
      fim.select(col("doc_id"), col("text_fim").as("text"))
        .join(docs.select("doc_id", "lang"), "doc_id"), shards = 4)
    assert(packed.count() == n1 && packed.filter(col("pack_id").isNull).count() == 0)

    // 5. end-to-end determinism under input repartitioning: the same
    //    chain over a reshuffled corpus yields the identical packed set
    val docs2 = docs.repartition(7)
    val signals2 = TextOps.signalBundle(docs2)
    val kept2 = docs2.join(signals2.filter(col("quality") >= 0.5 &&
      (col("rep3").isNull || col("rep3") <= 0.5)).select("doc_id"), "doc_id")
    val fim2 = TextOps.fimTransform(TextOps.keepFirstScrub(kept2)
      .select(col("doc_id"), col("text_clean").as("text")))
    val a = fim.select("doc_id", "mode", "text_fim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = fim2.select("doc_id", "mode", "text_fim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b, "the chain is deterministic under repartitioning")
  }
}
