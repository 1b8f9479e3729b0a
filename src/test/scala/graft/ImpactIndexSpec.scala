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

  test("a partial store must never serve: missing tables are loud") {
    val (_, queries, _) = split(sfDir)
    val bare = Files.createTempDirectory("graft_impidx_partial").toString + "/idx"
    val e = intercept[IllegalArgumentException](
      TextOps.impactSearchServe(queries, bare))
    assert(e.getMessage.contains("writeImpactIndex"),
      s"partial store must point at the freeze path: ${e.getMessage}")
  }
}
