package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import graft.operators.TextOps

/** The impact index persistence lifecycle (r19):
  * writeImpactIndex/readImpactIndex/impactSearchServe/impactIndexDrift —
  * the lexical tier's build-once/serve-many form, parity with the IVF
  * saveIvfIndex/loadIvfIndex family.
  */
class ImpactIndexSpec extends SparkSpec {

  private def split(dir: String) = {
    val docs = graft.sources.Tables.documents(spark, dir)
    (docs.filter(col("doc_id") >= 10L), docs.filter(col("doc_id") < 10L), docs)
  }

  test("round-trip: serving from the persisted store is row-identical to the in-plan serving read (q152prod)") {
    val (corpus, queries, docs) = split(sfDir)
    val path = Files.createTempDirectory("graft_impidx").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)

    val served = TextOps.impactSearchServe(queries, path).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("lex_u"), r.getAs[Long]("rk"))).toSet
    val inPlan = TextOps.impactSearch(docs, instrument = false).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("lex_u"), r.getAs[Long]("rk"))).toSet
    assert(served == inPlan,
      s"persisted-store serving diverged from the in-plan read: " +
        s"only-served=${served -- inPlan}, only-inplan=${inPlan -- served}")
    assert(served.nonEmpty, "degenerate fixture: no results at all")
  }

  test("frozen context: the serve scores with the STORE's k1/b, not defaults") {
    val (corpus, queries, docs) = split(sfDir)
    val path = Files.createTempDirectory("graft_impidx_kb").toString + "/idx"
    // freeze a non-default context; the serve takes no k1/b at all
    TextOps.writeImpactIndex(corpus, path, topPerTerm = 8, k1 = 2.0, b = 0.5)
    val served = TextOps.impactSearchServe(queries, path).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("lex_u"))).toSet
    val expected = TextOps.impactSearch(docs, topPerTerm = 8, k1 = 2.0,
        b = 0.5, instrument = false).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("lex_u"))).toSet
    assert(served == expected,
      "serve must replay the frozen k1/b/topPerTerm, never defaults")
  }

  test("serve join shape: the store never shuffles, even with auto-broadcast off; postings scan is partition-pruned on tb") {
    val (corpus, queries, _) = split(sfDir)
    val path = Files.createTempDirectory("graft_impidx_plan").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val served = TextOps.impactSearchServe(queries, path)
      val plan = served.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"store-side joins must stay broadcast probes (the gate-family " +
          s"join direction — the only one that survives a 100-TB store):\n$plan")
      assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
        s"the postings/df scans must prune on the query bag's tb buckets:\n$plan")
      assert(served.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("drift probe: fresh corpus reads stable, a shifted corpus trips PSI or len_ratio, missing histogram is loud") {
    import spark.implicits._
    val (corpus, _, _) = split(sfDir)
    val path = Files.createTempDirectory("graft_impidx_drift").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)

    // same corpus → no drift, ratio exactly 1
    val same = TextOps.impactIndexDrift(corpus, path).head()
    assert(same.getAs[Double]("psi") < 0.1,
      s"identical corpus must read stable, psi=${same.getAs[Double]("psi")}")
    assert(math.abs(same.getAs[Double]("len_ratio") - 1.0) < 1e-9)

    // a shifted snapshot: keep only the longest docs and append a burst
    // of novel low-df vocabulary — df histogram and avglen both move
    val burst = (0 until 400)
      .map(i => (900000L + i, s"novelterm$i xq$i zz$i"))
      .toDF("doc_id", "text")
    val shifted = corpus.select("doc_id", "text")
      .filter(org.apache.spark.sql.functions.length(col("text")) > 200)
      .unionByName(burst)
    val drifted = TextOps.impactIndexDrift(shifted, path).head()
    assert(drifted.getAs[Double]("psi") > 0.1 ||
        math.abs(drifted.getAs[Double]("len_ratio") - 1.0) > 0.25,
      s"a vocabulary burst + length shift must register: psi=" +
        s"${drifted.getAs[Double]("psi")} len_ratio=${drifted.getAs[Double]("len_ratio")}")

    // an index without the histogram (or stats) must refuse loudly
    val bare = Files.createTempDirectory("graft_impidx_bare").toString + "/idx"
    val e = intercept[IllegalArgumentException](
      TextOps.impactIndexDrift(corpus, bare))
    assert(e.getMessage.contains("writeImpactIndex"))
  }

  test("append: split-invariant exact head merge, untouched buckets byte-identical, appended docs served") {
    import spark.implicits._
    val (corpus, queries, _) = split(sfDir)
    def freeze(): String = {
      val p = java.nio.file.Files.createTempDirectory("graft_impapp").toString + "/idx"
      TextOps.writeImpactIndex(corpus, p)
      p
    }
    def postings(p: String): Set[Seq[Any]] =
      spark.read.parquet(s"$p/postings").collect().map(_.toSeq).toSet
    // batches of NEW docs built from frozen-vocab words of the corpus
    val vocab = corpus.select(org.apache.spark.sql.functions
        .explode(org.apache.spark.sql.functions.split($"text", " ")))
      .filter(org.apache.spark.sql.functions.length($"col") > 0)
      .distinct().limit(30).as[String].collect()
    val bDocs = Seq((900001L, vocab.take(8).mkString(" ")),
      (900002L, (vocab.slice(4, 10) ++ vocab.slice(4, 10)).mkString(" ")))
      .toDF("doc_id", "text")
    val cDocs = Seq((900003L, vocab.slice(10, 22).mkString(" ")))
      .toDF("doc_id", "text")

    // split invariance: append B then C == append B∪C, row for row
    val p1 = freeze(); val p2 = freeze()
    TextOps.impactIndexAppend(bDocs, p1)
    TextOps.impactIndexAppend(cDocs, p1)
    TextOps.impactIndexAppend(bDocs.unionByName(cDocs), p2)
    assert(postings(p1) == postings(p2),
      "append must be split-invariant (the exact-merge property)")

    // untouched buckets' FILES are never rewritten (the partial-rebuild
    // discipline): compare each tb partition's file list + sizes before
    // and after an append that touches a strict subset of buckets
    val p3 = freeze()
    def fileSig(p: String): Map[String, Seq[(String, Long)]] = {
      val root = new java.io.File(s"$p/postings")
      root.listFiles().filter(_.getName.startsWith("tb=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length)).toSeq.sortBy(_._1)
      }.toMap
    }
    val before = fileSig(p3)
    TextOps.impactIndexAppend(bDocs, p3)
    val after = fileSig(p3)
    val touched = after.keySet.filter(k =>
      before.get(k) != after.get(k)) ++ (after.keySet -- before.keySet)
    assert(touched.nonEmpty && touched.size < before.size,
      s"an 8-word batch must rewrite a strict subset of buckets: $touched")
    (before.keySet -- touched).foreach { k =>
      assert(before(k) == after(k), s"untouched bucket $k was rewritten")
    }

    // the appended doc is reachable through frozen-vocab terms: a query
    // doc whose bag intersects bDocs' words can retrieve 900001/900002
    val hits = TextOps.impactSearchServe(queries, p3, k = 200).collect()
      .map(_.getAs[Long]("c_id")).toSet
    // (not every query bag overlaps; assert the postings carry them)
    val carried = spark.read.parquet(s"$p3/postings")
      .filter($"c_id" >= 900001L).count()
    assert(carried > 0, "appended docs must occupy posting heads")
    assert(hits.nonEmpty)

    // a pure-novel-vocabulary batch cannot mint postings: store unchanged
    val novel = Seq((900009L, "zzqx1 zzqx2 zzqx3")).toDF("doc_id", "text")
    val sigBefore = fileSig(p3)
    TextOps.impactIndexAppend(novel, p3)
    assert(fileSig(p3) == sigBefore,
      "novel-vocab docs score nothing under the frozen df and must not touch the store")

    // re-ingesting an indexed doc refuses loudly
    val e = intercept[IllegalArgumentException](
      TextOps.impactIndexAppend(bDocs, p3))
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("re-ingestion guard is EXACT (r20): a changed-text re-ingestion whose old postings sit in untouched buckets still refuses") {
    import spark.implicits._
    val (corpus, _, _) = split(sfDir)
    val path = Files.createTempDirectory("graft_impreg").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)
    val vocab = corpus.select(org.apache.spark.sql.functions
        .explode(org.apache.spark.sql.functions.split($"text", " ")))
      .filter(org.apache.spark.sql.functions.length($"col") > 0)
      .distinct().limit(40).as[String].collect()
    // first ingestion of 900021 lands postings under words A
    TextOps.impactIndexAppend(
      Seq((900021L, vocab.take(6).mkString(" "))).toDF("doc_id", "text"), path)
    // the SAME doc re-arrives fully re-worded: its new terms live in
    // other tb buckets, so the r19 head-scan guard (touched buckets
    // only) saw no collision — the id registry must still refuse
    val e = intercept[IllegalArgumentException](
      TextOps.impactIndexAppend(
        Seq((900021L, vocab.slice(20, 32).mkString(" "))).toDF("doc_id", "text"),
        path))
    assert(e.getMessage.contains("registry"), e.getMessage)
    // and a doc that entered at FREEZE time (no postings touched by the
    // batch needed) refuses too: take a real corpus doc's id
    val cid = corpus.select("doc_id").head().getLong(0)
    val e2 = intercept[IllegalArgumentException](
      TextOps.impactIndexAppend(
        Seq((cid, vocab.slice(30, 36).mkString(" "))).toDF("doc_id", "text"),
        path))
    assert(e2.getMessage.contains("registry"), e2.getMessage)
  }

  test("ifAbsent append: replays are idempotent, mixed batches land only the unseen docs") {
    import spark.implicits._
    val (corpus, _, _) = split(sfDir)
    val path = Files.createTempDirectory("graft_impabs").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)
    val vocab = corpus.select(org.apache.spark.sql.functions
        .explode(org.apache.spark.sql.functions.split($"text", " ")))
      .filter(org.apache.spark.sql.functions.length($"col") > 0)
      .distinct().limit(30).as[String].collect()
    val b1 = Seq((900031L, vocab.take(7).mkString(" "))).toDF("doc_id", "text")
    TextOps.impactIndexAppend(b1, path)
    def postings(): Set[Seq[Any]] =
      spark.read.parquet(s"$path/postings").collect().map(_.toSeq).toSet
    val after1 = postings()
    // full replay of the committed batch: no-op, no error
    TextOps.impactIndexAppend(b1, path, ifAbsent = true)
    assert(postings() == after1, "a replayed batch must change nothing")
    // mixed batch: the replayed doc drops, the fresh one lands exactly
    // as if appended alone
    val fresh = Seq((900032L, vocab.slice(7, 15).mkString(" ")))
      .toDF("doc_id", "text")
    TextOps.impactIndexAppend(b1.unionByName(fresh), path, ifAbsent = true)
    val mixed = postings()
    val control = Files.createTempDirectory("graft_impabs2").toString + "/idx"
    TextOps.writeImpactIndex(corpus, control)
    TextOps.impactIndexAppend(b1, control)
    TextOps.impactIndexAppend(fresh, control)
    val controlSet =
      spark.read.parquet(s"$control/postings").collect().map(_.toSeq).toSet
    assert(mixed == controlSet,
      "ifAbsent must land exactly the unseen docs' postings")
  }

  test("freshness-gated serve (r20): a drifted corpus refuses, an appended-but-fresh one serves") {
    import spark.implicits._
    val (corpus, queries, _) = split(sfDir)
    val path = Files.createTempDirectory("graft_impfresh").toString + "/idx"
    TextOps.writeImpactIndex(corpus, path)
    // the build corpus itself: fresh by construction → serves
    assert(TextOps.impactSearchServe(queries, path,
      freshnessCorpus = Some(corpus)).count() > 0)
    // a small append barely moves the df histogram: still fresh
    val vocab = corpus.select(org.apache.spark.sql.functions
        .explode(org.apache.spark.sql.functions.split($"text", " ")))
      .filter(org.apache.spark.sql.functions.length($"col") > 0)
      .distinct().limit(10).as[String].collect()
    val small = Seq((900041L, vocab.take(6).mkString(" "))).toDF("doc_id", "text")
    TextOps.impactIndexAppend(small, path)
    val grown = corpus.select("doc_id", "text").unionByName(small)
    assert(TextOps.impactSearchServe(queries, path,
      freshnessCorpus = Some(grown)).count() > 0,
      "an appended-but-fresh corpus must keep serving")
    // a shifted snapshot — all-novel vocabulary (df histogram collapses
    // to df=1 mass) AND 3-token docs (len_ratio far under 0.8): both
    // policy axes trip, so refusal under the DEFAULT policy is certain
    val shifted = (0 until 400)
      .map(i => (910000L + i, s"novelterm$i xq$i zz$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextOps.impactSearchServe(queries, path,
        freshnessCorpus = Some(shifted)))
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains("writeImpactIndex"), e.getMessage)
    // the un-policied serve is unchanged (q152prod's path): no corpus,
    // no check, same rows
    assert(TextOps.impactSearchServe(queries, path).count() > 0)
  }

  test("a partial store must never serve: missing tables are loud") {
    val (_, queries, _) = split(sfDir)
    val bare = Files.createTempDirectory("graft_impidx_partial").toString + "/idx"
    val e = intercept[IllegalArgumentException](
      TextOps.impactSearchServe(queries, bare))
    assert(e.getMessage.contains("writeImpactIndex"),
      s"partial store must point at the freeze path: ${e.getMessage}")
  }
}
