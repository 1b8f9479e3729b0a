package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}

class VectorOpsSpec extends SparkSpec {

  test("cosine kernel: identical vectors score 1, orthogonal score 0") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0)),
      (2L, Seq(1.0, 0.0), Seq(0.0, 3.0)),
      (3L, Seq(1.0, 1.0), Seq(-1.0, -1.0)),
    )).toDF("id", "a", "b")
    val got = df.select(col("id"), round(VectorOps.cosine(col("a"), col("b")), 9).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.0)
    assert(got(3L) === -1.0)
  }

  test("q38 top-k: k=5 per query, rank 1 is the true argmax, deterministic") {
    val res = VectorOps.q38EmbedTopk(spark, sfDir)
    val rows = res.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    assert(byQ.values.forall(_.length == 5))
    // rank ordering consistent with scores
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val scores = sorted.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // stable across runs (determinism)
    val again = VectorOps.q38EmbedTopk(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q95 hybrid rerank: 5 per query from the cos-top-20, quality can reorder, deterministic") {
    val res = VectorOps.q95HybridRerank(spark, sfDir).collect()
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to 5L))
      val h = sorted.map(_.getAs[Double]("hybrid"))
      assert(h.zip(h.tail).forall { case (a, b) => a >= b },
        s"hybrid must be non-increasing in rank: ${h.toSeq}")
    }
    // stage-1 membership (survivors ⊆ exact cos-top-20) is proven by the
    // DuckDB oracle, which recomputes both stages; here assert determinism
    val again = VectorOps.q95HybridRerank(spark, sfDir).collect()
    assert(res.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("minhash LSH: exact duplicate docs always collide in every band") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffle join window agg scan"),
      (2L, "spark shuffle join window agg scan"), // exact dup of 1
      (3L, "completely different words entirely unrelated body"),
    ).toDF("doc_id", "text")
    val pairs = VectorOps.q36MinhashLshOn(docs).collect()
    val p12 = pairs.find(r => r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L)
    assert(p12.isDefined, "exact dups must share bands")
    assert(p12.get.getAs[Long]("n_shared_bands") == VectorOps.Bands.toLong)
    assert(!pairs.exists(r => r.getAs[Long]("b_id") == 3L || r.getAs[Long]("a_id") == 3L))
  }

  test("LSH dedup clustering maps exact dups to one keeper, linear output") {
    import spark.implicits._
    val docs = Seq(
      (10L, "spark shuffle join window agg scan"),
      (11L, "spark shuffle join window agg scan"),
      (12L, "spark shuffle join window agg scan"),
      (13L, "totally different content with other words"),
    ).toDF("doc_id", "text")
    val reps = VectorOps.q51DedupClustersOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(reps(10L) == 10L && reps(11L) == 10L && reps(12L) == 10L)
    assert(reps(13L) == 13L)
  }

  test("q51prod (fused xxhash64 family) clusters exact dups like the oracled form") {
    import spark.implicits._
    // the prod path differs from the registered q51 only in hash FAMILY;
    // exact duplicates share every band bucket under ANY family, so on a
    // planted dup/distinct corpus both forms must agree exactly
    val docs = Seq(
      (10L, "spark shuffle join window agg scan"),
      (11L, "spark shuffle join window agg scan"),
      (12L, "spark shuffle join window agg scan"),
      (13L, "totally different content with other words"),
    ).toDF("doc_id", "text")
    def reps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    val prod = reps(VectorOps.q51ProdOn(docs))
    assert(prod == reps(VectorOps.q51DedupClustersOn(docs)))
    assert(prod == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L))
    // rep minimality holds on real data too (the one-pass min chain can
    // only ever propagate ids downward)
    VectorOps.q51Prod(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("cluster_rep") <= r.getAs[Long]("doc_id"))
    }
  }

  test("converged clustering links components the single pass misses") {
    import spark.implicits._
    // doc 2 bridges 1 and 3 (shares words with both), 1 and 3 share none:
    // transitive closure must put all three in one cluster
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon nine ten eleven twelve thirteen"),
      (3L, "nine ten eleven twelve thirteen"),
      (4L, "unrelated words entirely different content"),
    ).toDF("doc_id", "text")
    val reps = VectorOps.dedupClustersConverged(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    // 1-2 and 2-3 collide in at least one band each (half-shared word sets)
    if (reps(2L) == 1L && reps(3L) != 1L)
      fail(s"closure not transitive: $reps")
    assert(reps(4L) == 4L)
    // fixpoint: every rep is itself a keeper (rep of rep == rep)
    reps.values.foreach(r => assert(reps(r) == r, s"non-canonical rep in $reps"))
  }

  test("q36 bucket cap: default cap output identical to exact pairwise at sf0.01") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val capped = VectorOps.q36MinhashLshOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = VectorOps.q36MinhashLshOn(docs, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == exact, "sf0.01 buckets (max width 279) must all stay on the pairwise path")
  }

  test("q36 bucket cap: wide buckets star-route, keeping every member connected") {
    import spark.implicits._
    val dup = "spark shuffle join window agg scan"
    val docs = ((1L to 10L).map(i => (i, dup)) :+
      (20L, "completely different words entirely unrelated body") :+
      (21L, "completely different words entirely unrelated body")).toDF("doc_id", "text")
    val pairs = VectorOps.q36MinhashLshOn(docs, maxBucketWidth = 4).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("n_shared_bands")))
    // the 10-wide dup bucket exceeds the cap in every band: star edges only
    val starEdges = pairs.filter(_._1 == 1L)
    assert(starEdges.map(_._2).sorted.sameElements(2L to 10L),
      s"every wide-bucket member must link to the bucket min, got $pairs")
    assert(starEdges.forall(_._3 == VectorOps.Bands.toLong), "co-occurs in all 4 wide buckets")
    assert(!pairs.exists(p => p._1 > 1L && p._2 <= 10L), "no pairwise listing inside wide buckets")
    // the 2-wide bucket is under the cap: exact pairwise as before
    assert(pairs.contains((20L, 21L, VectorOps.Bands.toLong)))
  }

  test("q37 chunk-bucket cap: capped equals exact at sf0.01; wide buckets star-route") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collect(VectorOps.q37SimhashOn(docs)) ==
      collect(VectorOps.q37SimhashOn(docs, Int.MaxValue)),
      "sf0.01 chunk buckets are all under the cap - capped must equal exact")

    // planted wide bucket: 10 identical docs (hamming 0, same chunk keys)
    import spark.implicits._
    val dup = "spark shuffle join window agg scan"
    val planted = (1L to 10L).map(i => (i, dup)).toDF("doc_id", "text")
    val pairs = collect(VectorOps.q37SimhashOn(planted, maxBucketWidth = 4))
    assert(pairs == (2L to 10L).map(i => (1L, i, 0L)).toSet,
      s"wide bucket must star-route to the bucket min only, got $pairs")
  }

  test("q37 portable form: same structural guarantees, md5-slice family") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collect(VectorOps.q37SimhashPortableOn(docs)) ==
      collect(VectorOps.q37SimhashPortableOn(docs, Int.MaxValue)),
      "portable family: capped must equal exact at sf0.01")
    import spark.implicits._
    val dup = "spark shuffle join window agg scan"
    val planted = ((1L to 10L).map(i => (i, dup)) :+
      (20L, "completely different words entirely unrelated body"))
      .toDF("doc_id", "text")
    val pairs = collect(VectorOps.q37SimhashPortableOn(planted, maxBucketWidth = 4))
    assert(pairs == (2L to 10L).map(i => (1L, i, 0L)).toSet,
      s"identical docs: hamming-0 star edges only, unrelated doc apart: $pairs")
    // both halves stay in [0, 2^32): no sign-bit divergence to port
    val sh = VectorOps.simhashPortable(planted).collect()
    sh.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("sh_lo"), r.getAs[Long]("sh_hi"))
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32),
        s"halves must be unsigned-32 ranged: $lo/$hi")
    }
  }

  test("q39 bucket cap: capped equals exact at sf0.01; hot buckets star-route") {
    def vecsOf(dir: String) =
      graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("cos"))).toSet
    val vecs = vecsOf("/root/testdata/sf0.01")
    assert(collect(VectorOps.q39EmbedLshOn(vecs)) ==
      collect(VectorOps.q39EmbedLshOn(vecs, Int.MaxValue)),
      "sf0.01 signature buckets are all under the cap - capped must equal exact")

    // planted hot bucket: 10 identical vectors share one signature; a
    // 2-wide opposite-sign bucket stays on the exact path
    import spark.implicits._
    val up = Seq.fill(64)(1.0)
    val down = up.map(-_)
    val planted = ((1L to 10L).map(i => (i, up)) :+ (20L, down) :+ (21L, down))
      .toDF("vec_id", "vec")
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val pairs = collect(VectorOps.q39EmbedLshOn(planted, maxBucketWidth = 4))
    assert(pairs.map(p => (p._1, p._2)) ==
      ((2L to 10L).map(i => (1L, i)) :+ (20L -> 21L)).toSet,
      s"hot bucket must star-route to the bucket min only, got $pairs")
    assert(pairs.forall(_._3 == 1.0), "identical vectors score cosine 1")

    // star edges are connectivity scaffolding, exempt from the similarity
    // threshold: with an unsatisfiable threshold the narrow pair (20,21)
    // drops but every star edge survives - filtering them would split the
    // wide bucket's cluster whenever its bucket-min is dissimilar
    val starsOnly = collect(VectorOps.q39EmbedLshOn(
      planted, maxBucketWidth = 4, threshold = 2.0))
    assert(starsOnly.map(p => (p._1, p._2)) ==
      (2L to 10L).map(i => (1L, i)).toSet,
      s"star edges must bypass the threshold, got $starsOnly")
  }

  test("width cap preserves connected components (property over random corpora)") {
    import spark.implicits._
    // Star-routing's contract is NOT pair-set equality - it is that dedup
    // connectivity survives: capped and exact pair graphs must induce the
    // same components, with the capped graph never inventing an edge
    // between docs the exact graph keeps apart.
    def components(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      (1L to n.toLong).map(i => i -> find(i)).toMap
    }
    val vocab = Seq("spark", "join", "agg", "scan", "sort", "window", "key", "row")
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40
      val docs = (1L to n.toLong).map { i =>
        // small vocab + short docs -> rich bucket collisions and wide buckets
        (i, Seq.fill(4 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("doc_id", "text")
      def pairs(cap: Int) = VectorOps.q36MinhashLshOn(docs, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val exact = pairs(Int.MaxValue)
      val capped = pairs(3)
      val (ce, cc) = (components(n, exact), components(n, capped))
      // same partition of the doc ids (roots may differ; member sets not)
      def blocks(m: Map[Long, Long]) =
        (1L to n.toLong).groupBy(m).values.map(_.toSet).toSet
      assert(blocks(ce) == blocks(cc),
        s"seed $seed: capped components diverge from exact")
      assert(capped.size <= exact.size, s"seed $seed: capping must not add pairs")
    }
  }

  test("fused MinHash kernel is bit-identical to the aggregate formulation") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val fused = VectorOps.minhashSignatures(docs)
    val agg = VectorOps.minhashSignaturesAgg(docs)
      .select(col("doc_id") +:
        (0 until VectorOps.NumHashes).map(i => col(s"mh$i").as(s"agg$i")): _*)
    val joined = fused.join(agg, "doc_id")
    assert(joined.count() == docs.count())
    val diff = (0 until VectorOps.NumHashes)
      .map(i => col(s"mh$i") =!= col(s"agg$i")).reduce(_ || _)
    assert(joined.filter(diff).count() == 0,
      "fused kernel must reproduce xxhash64(lit(i), w) chains exactly")
  }

  test("fused SimHash64 kernel is bit-identical to the aggregate formulation") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val fused = VectorOps.simhash(docs)
    val agg = VectorOps.simhashAgg(docs).withColumnRenamed("simhash", "simhash_agg")
    val joined = fused.join(agg, "doc_id")
    assert(joined.count() == docs.count(), "aggregate form must cover every doc")
    val diff = joined.filter(col("simhash") =!= col("simhash_agg")).count()
    assert(diff == 0, s"$diff signatures differ between fused kernel and aggregate reference")
  }

  test("simhash: identical docs hamming 0; disjoint docs far apart") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten"),
    ).toDF("doc_id", "text")
    val sh = VectorOps.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 8)
  }

  test("IVF top-k: deterministic, k per query, and beats random-probe recall") {
    import org.apache.spark.sql.functions._
    def all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val exact = VectorOps.q38EmbedTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val ivf = VectorOps.ivfTopk(all).collect()
    assert(ivf.length == 50) // 5 per query
    val ivfSet = ivf.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val recall = (exact & ivfSet).size.toDouble / exact.size
    // nProbe=8 of ~sqrt(n) centroids: random probing would give ~8/22;
    // centroid ranking must reach the 0.8 recall target even on
    // near-random vectors
    assert(recall >= 0.8, s"recall $recall")
    val again = VectorOps.ivfTopk(all).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    assert(ivfSet == again)
    // the shipped q57 (oracled recall-gated form) folds exactly this
    // check in-query: one row, the query count, and the recall verdict
    val gated = VectorOps.q57IvfTopk(spark, sfDir).collect()
    assert(gated.length == 1)
    assert(gated.head.getAs[Long]("n_queries") == 10L)
    assert(gated.head.getAs[Boolean]("recall_ok"), s"recall was $recall")
  }

  test("TopKFreq sketch: exact under capacity, finds the majority item under eviction") {
    import spark.implicits._
    import graft.plans.GraftFunctions.topk_freq
    // 60% of tokens are "hot"; 200 distinct cold tokens vs capacity 16
    val tokens = (Seq.fill(300)("hot") ++ (1 to 200).map(i => s"cold$i")).toDF("w")
      .repartition(8) // force partial buffers + merge
    val top = tokens.agg(topk_freq(col("w"), k = 3, capacity = 16).as("t"))
      .select(explode(col("t")).as("s")).select("s.word", "s.cnt").collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getLong(1) >= 300) // SpaceSaving never undercounts
  }

  test("TopKFreq survives tokens larger than the 64KB modified-UTF8 limit") {
    import spark.implicits._
    import graft.plans.GraftFunctions.topk_freq
    val big = "x" * 70000
    val tokens = (Seq.fill(5)(big) ++ Seq.fill(3)("small")).toDF("w").repartition(2)
    val top = tokens.agg(topk_freq(col("w"), k = 2, capacity = 16).as("t"))
      .select(explode(col("t")).as("s")).select("s.word", "s.cnt").collect()
    assert(top.head.getString(0) == big && top.head.getLong(1) == 5L)
  }

  test("native VectorAvg matches the posexplode formulation; nulls skipped; mixed lengths fail") {
    import spark.implicits._
    // power-of-two values: sums are exact in binary, so both formulations
    // must agree bit-for-bit regardless of accumulation order
    val vecs = (1 to 64).map(i =>
      (i % 4, Seq(i.toDouble, i * 0.5, i * 0.25, -i.toDouble)))
      .toDF("k", "vec").repartition(7) // force cross-partition merges
    val native = vecs.groupBy("k")
      .agg(graft.plans.GraftFunctions.vec_avg(col("vec")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    val reference = vecs.select(col("k"), posexplode(col("vec")))
      .groupBy("k", "pos").agg(avg("col").as("m"))
      .groupBy("k").agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("k"), expr("transform(pm, x -> x.m)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    assert(native == reference, s"native $native vs reference $reference")

    // nulls are skipped like SQL avg; an all-null group is null
    val withNulls = Seq((1, Seq(2.0, 4.0)), (1, null), (2, null))
      .toDF("k", "vec")
    val n = withNulls.groupBy("k")
      .agg(graft.plans.GraftFunctions.vec_avg(col("vec")).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(n(1).map(_.asInstanceOf[scala.collection.Seq[Double]].toList)
      .contains(List(2.0, 4.0)))
    assert(n(2).isEmpty, "all-null group must yield null, not zeros")

    // silent truncation would corrupt centroids - mixed lengths throw
    val e = intercept[Exception](Seq((1, Seq(1.0)), (1, Seq(1.0, 2.0)))
      .toDF("k", "vec")
      .groupBy("k").agg(graft.plans.GraftFunctions.vec_avg(col("vec")))
      .collect())
    assert(e.getMessage != null)

    // the SQL face works through the extensions
    vecs.createOrReplaceTempView("vecs_avg_v")
    assert(spark.sql("SELECT k, vec_avg(vec) FROM vecs_avg_v GROUP BY k").count() == 4)

    // float input: the embeddings tables' vec column is array<float>, and
    // reading a float-backed array with double accessors silently
    // reinterprets bits (wrong means ~1e-8 where truth is ~1e-2, no
    // error) - THE bug this case pins down
    val floats = Seq((1, Seq(1.0f, 3.0f)), (1, Seq(3.0f, 5.0f)))
      .toDF("k", "vec")
    val fm = floats.groupBy("k")
      .agg(graft.plans.GraftFunctions.vec_avg(col("vec")).as("m"))
      .head().getSeq[Double](1).toList
    assert(fm == List(2.0, 4.0), s"float vectors must average correctly, got $fm")
  }

  test("TopCentroids assignment kernel matches the crossJoin+window formulation") {
    import org.apache.spark.sql.expressions.Window
    val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val (centroids, assignments) = VectorOps.ivfIndex(corpus)
    val viaKernel = assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val cos = VectorOps.dot(col("vec"), col("cvec")) / (col("norm") * col("cnorm"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val viaWindow = corpus.crossJoin(broadcast(centroids))
      .withColumn("ccos", cos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= VectorOps.DefaultAssignReplicas)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaKernel == viaWindow,
      "per-row kernel must pick the identical replicated assignment")
  }

  test("TopCentroids rejects dimension drift instead of truncating the dot product") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val kernel = toCol(graft.plans.TopCentroids(
      toExpr(col("vec")), toExpr(col("norm")),
      Array(0), Array(Array(1.0, 0.0, 0.0)), Array(1.0), k = 1))
    val wrongDim = Seq((1L, Seq(1.0, 2.0), math.sqrt(5.0))).toDF("vec_id", "vec", "norm")
    val e = intercept[Exception](wrongDim.select(kernel).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("2-dim vector against 3-dim centroid")),
      s"dimension drift must fail loudly, got $e")
  }

  test("native DotProduct expression matches the higher-order reference bit-for-bit") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val both = emb.limit(200).select(
      VectorOps.dot(col("embedding"), col("embedding")).as("native"),
      VectorOps.dotHof(VectorOps.asDouble(col("embedding")),
        VectorOps.asDouble(col("embedding"))).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // and it survives codegen + SQL registration
    graft.plans.GraftFunctions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_t")
    val viaSql = spark.sql("SELECT vec_dot(embedding, embedding) AS d FROM emb_t")
    assert(viaSql.collect().forall(_.getDouble(0) > 0))
  }

  test("persisted IVF index: saved+loaded index answers identically to in-memory") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf")
    val dir = root.toString + "/index"
    try {
      val all = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val queries = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
      val corpus = all.filter(col("vec_id") >= 10)
      val (centroids, assignments) = VectorOps.ivfIndex(corpus)
      val direct = VectorOps.ivfSearch(queries, corpus, centroids, assignments)
        .collect().map(_.toString).sorted
      VectorOps.saveIvfIndex(centroids, assignments, dir)
      val (lc, la) = VectorOps.loadIvfIndex(spark, dir)
      val viaDisk = VectorOps.ivfSearch(queries, corpus, lc, la)
        .collect().map(_.toString).sorted
      assert(viaDisk.sameElements(direct), "round-tripped index must answer identically")
      // bucket files are partition-pruned by centroid
      assert(new java.io.File(s"$dir/assignments").listFiles()
        .exists(_.getName.startsWith("cid=")), "assignments must be partitioned by cid")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("corpus-scaled near-dup blocking: width-pinned plan arithmetic, planted twins recalled") {
    // plan arithmetic at the scales it exists for (pure function):
    // bit width pins the expected bucket width, so candidate pairs stay
    // ~linear in n instead of n²/2^bits with fixed bits
    val (b1, n1, r1) = VectorOps.neardupBlockingPlan(100000L, 0.8)
    assert(b1 == 9, s"100k-wide label at width 256 needs 9 bits, got $b1")
    assert(100000L / (1L << b1) <= 256, "expected bucket width must be pinned")
    assert(r1 >= 0.95, f"recall target met at 100k: $r1%.3f with $n1 bands")
    val (b2, _, _) = VectorOps.neardupBlockingPlan(100000000L, 0.8)
    assert(b2 > b1, "bits must grow with the corpus")
    // at the 16-bit/32-band clamps the plan reports the honest recall
    val (b3, n3, r3) = VectorOps.neardupBlockingPlan(1000000000L, 0.8)
    assert(b3 == 16 && n3 == 32 && r3 < 0.95,
      s"clamped plan must report its reduced recall, got ($b3, $n3, $r3)")
    // tiny corpora degrade to the gate-scale tuning (2 bits)
    assert(VectorOps.neardupBlockingPlan(200L, 0.8)._1 == 2)
    // an out-of-domain threshold fails loudly, not as NaN bands
    intercept[IllegalArgumentException](VectorOps.neardupBlockingPlan(1000L, 0.0))

    // planted near-twins (cos ~0.99, same label) surface through the
    // auto-blocked join; unrelated pairs stay excluded by the threshold
    import spark.implicits._
    val base = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").as("vec"))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val twins = base.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 500000L)
      // nudge one coordinate: cosine stays ~0.99+, identity does not
      .withColumn("vec", concat(
        slice(col("vec"), 1, 63),
        array(element_at(col("vec"), 64) * lit(1.05f))))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val corpus = base.unionByName(twins).localCheckpoint()
    val pairs = VectorOps.embedNeardupBlockedAuto(corpus, threshold = 0.9)
      .filter((col("a_id") < 20 && col("b_id") >= 500000L) ||
        (col("b_id") < 20 && col("a_id") >= 500000L))
      .filter(abs(coalesce(col("a_id"), lit(0L)) - coalesce(col("b_id"), lit(0L))) === 500000L)
      .count()
    assert(pairs >= 16,
      s"at least 16/20 planted cos~0.99 twins must surface (p^bits per band, multiple bands): $pairs")
    graft.CacheHygiene.release(corpus)
  }

  test("sharded IVF: hash-routed sub-indexes, cross-shard merge finds planted twins, envelope gate") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_shard")
    val dir = root.toString + "/index"
    try {
      val all = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val queries = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
      // corpus includes exact twins of every query under fresh ids: the
      // twin lands in exactly ONE shard by hash routing, so finding it at
      // rank 1 proves every shard is searched and the merge is global
      val twins = queries.select(
        (col("q_id") + 100000L).as("vec_id"), col("q_vec").as("vec"),
        col("q_norm").as("norm"))
      val corpus = all.filter(col("vec_id") >= 10)
        .select("vec_id", "vec", "norm").unionByName(twins)
        .localCheckpoint()

      val shards = 3
      VectorOps.ivfShardedIndex(corpus, dir, shards)

      // layout: per-shard sub-indexes + the shard-count marker
      (0 until shards).foreach { i =>
        assert(new java.io.File(s"$dir/shard=$i/centroids").exists(), s"shard $i centroids")
        assert(new java.io.File(s"$dir/shard=$i/assignments").exists(), s"shard $i assignments")
      }
      assert(new java.io.File(s"$dir/_shards").exists())

      // routing: every assignment row lives in the shard its id hashes to,
      // and the shards together cover the corpus exactly
      val perShard = (0 until shards).map { i =>
        val asg = spark.read.parquet(s"$dir/shard=$i/assignments")
        assert(asg.filter(
          pmod(xxhash64(lit("ivf-shard"), col("vec_id")), lit(shards)) =!= i).count() == 0,
          s"shard $i holds a foreign vector")
        asg.select("vec_id").distinct()
      }
      assert(perShard.reduce(_ union _).distinct().count() == corpus.count(),
        "the shards' assignments must cover the corpus exactly")

      // cross-shard search: every query's twin surfaces at rank 1, cos 1
      val top1 = VectorOps.ivfShardedSearch(queries, corpus, dir)
        .filter(col("rk") === 1)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      queries.select("q_id").collect().map(_.getLong(0)).foreach { q =>
        assert(top1(q) == ((q + 100000L, 1.0)),
          s"query $q must find its twin through the sharded search, got ${top1.get(q)}")
      }
      // k rows per query, globally ranked, no duplicate candidates
      val res = VectorOps.ivfShardedSearch(queries, corpus, dir)
      assert(res.groupBy("q_id").count().filter(col("count") > 5).count() == 0)
      assert(res.groupBy("q_id", "c_id").count().filter(col("count") > 1).count() == 0)

      // sharded append: new twins route to their hash shard's sub-index
      // and surface at rank 1 without any rebuild
      val twins2 = queries.select(
        (col("q_id") + 200000L).as("vec_id"), col("q_vec").as("vec"),
        col("q_norm").as("norm"))
      VectorOps.ivfShardedAppend(twins2, dir)
      (0 until shards).foreach { i =>
        val asg = spark.read.parquet(s"$dir/shard=$i/assignments")
          .filter(col("vec_id") >= 200000L)
        assert(asg.filter(
          pmod(xxhash64(lit("ivf-shard"), col("vec_id")), lit(shards)) =!= i).count() == 0,
          s"appended vectors in shard $i must belong there by hash")
      }
      // the build-time twin (+100000) ties at cos 1.0 and outranks by id,
      // so the appended twin must appear at rank <= 2 with cos 1.0
      val grown = corpus.unionByName(twins2).localCheckpoint()
      val appended = VectorOps.ivfShardedSearch(queries, grown, dir)
        .filter(col("c_id") >= 200000L && col("rk") <= 2 && col("cos") === 1.0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      queries.select("q_id").collect().map(_.getLong(0)).foreach { q =>
        assert(appended.get(q).contains(q + 200000L),
          s"query $q must surface its sharded-appended twin, got ${appended.get(q)}")
      }
      graft.CacheHygiene.release(grown)

      // the envelope hard gate at the scales it exists for: 10^9 vectors
      // under 2 shards is still a linear-probe index (width >> 16k) and
      // must refuse; 64 shards is back inside the envelope
      val over = intercept[IllegalArgumentException](
        VectorOps.ivfShardEnvelopeCheck(1000000000L, 2))
      assert(over.getMessage.contains("shards"))
      VectorOps.ivfShardEnvelopeCheck(1000000000L, 64) // must not throw
      graft.CacheHygiene.release(corpus)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("sharded IVF: concurrent sub-builds, flat search plan, per-shard probe equivalence, rebuild safety") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_shard2")
    try {
      val corpus = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
        .filter(col("vec_id") >= 10)
        .localCheckpoint()
      val queries = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
          col("norm").as("q_norm"))

      // concurrency invariance: a serial build and a 3-thread build of
      // the same corpus produce byte-identical sub-indexes (each shard's
      // build is deterministic, so scheduling cannot leak into the index)
      val serialDir = root.toString + "/serial"
      val parallelDir = root.toString + "/parallel"
      VectorOps.ivfShardedIndex(corpus, serialDir, 3, buildThreads = 1)
      VectorOps.ivfShardedIndex(corpus, parallelDir, 3, buildThreads = 3)
      (0 until 3).foreach { i =>
        def slurp(base: String, art: String) =
          spark.read.option("recursiveFileLookup", "true")
            .parquet(s"$base/shard=$i/$art")
            .collect().map(_.toString).sorted.toSeq
        assert(slurp(serialDir, "centroids") == slurp(parallelDir, "centroids"),
          s"shard $i centroids must not depend on build concurrency")
        val sAsg = spark.read.parquet(s"$serialDir/shard=$i/assignments")
          .select("vec_id", "cid").collect().map(_.toString).sorted.toSeq
        val pAsg = spark.read.parquet(s"$parallelDir/shard=$i/assignments")
          .select("vec_id", "cid").collect().map(_.toString).sorted.toSeq
        assert(sAsg == pAsg,
          s"shard $i assignments must not depend on build concurrency")
      }

      // plan flatness: the search plan has the SAME node count at K=2 and
      // K=6 — one centroid scan, one kernel projection, one assignments
      // scan, one join, regardless of shard count (the r8 form unioned K
      // probe sub-plans and grew linearly)
      val k2Dir = root.toString + "/k2"
      VectorOps.ivfShardedIndex(corpus, k2Dir, 2, buildThreads = 2)
      val k6Dir = root.toString + "/k6"
      VectorOps.ivfShardedIndex(corpus, k6Dir, 6, buildThreads = 3)
      def planNodes(dir: String): Int = {
        val df = VectorOps.ivfShardedSearch(queries, corpus, dir)
        df.queryExecution.executedPlan.collect { case p => p }.size
      }
      val (n2, n6) = (planNodes(k2Dir), planNodes(k6Dir))
      assert(n2 == n6,
        s"sharded search plan must be shard-count-invariant, got K=2:$n2 K=6:$n6")

      // result equivalence with the per-shard formulation: globally
      // re-ranking the union of each shard's own ivfSearch top-k equals
      // the merged-candidate search (global top-k is a subset of the
      // per-shard top-k union; ties break on id both ways)
      val perShard = (0 until 3).map { i =>
        val (cent, asg) = VectorOps.loadIvfIndex(spark, s"$serialDir/shard=$i")
        VectorOps.ivfSearch(queries, corpus, cent, asg)
      }.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
      val expected = perShard
        .withColumn("rk2", row_number().over(w)).filter(col("rk2") <= 5)
        .select(col("q_id"), col("c_id"), col("cos"), col("rk2").as("rk"))
        .collect().map(_.toString).sorted.toSeq
      val got = VectorOps.ivfShardedSearch(queries, corpus, serialDir)
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected,
        "merged-kernel sharded search must equal the per-shard formulation")

      // rebuild safety (r9 reorder): a rebuild whose corpus write fails
      // leaves the previous index fully searchable — the marker retracts
      // only at the edge of the destructive per-shard overwrites
      val boom = corpus.withColumn("vec",
        when(expr("raise_error('staging boom')").isNull, col("vec")))
      intercept[Exception] {
        VectorOps.ivfShardedIndex(boom, serialDir, 3, buildThreads = 2)
      }
      assert(new java.io.File(s"$serialDir/_shards").exists(),
        "a failed restage must not retract the live index's marker")
      assert(VectorOps.ivfShardedSearch(queries, corpus, serialDir)
        .count() > 0, "the live index must survive a failed rebuild")
      graft.CacheHygiene.release(corpus)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("ivfAppend: appended vectors are searchable without a rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_app")
    val dir = root.toString + "/index"
    try {
      val all = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val queries = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
      val corpus = all.filter(col("vec_id") >= 10)
      val (centroids, assignments) = VectorOps.ivfIndex(corpus)
      VectorOps.saveIvfIndex(centroids, assignments, dir)

      // the appended batch: exact twins of the queries under fresh ids —
      // their true nearest neighbor is themselves, so search MUST surface
      // them at rank 1 with cos 1.0 if the append really took
      val twins = queries.select(
        (col("q_id") + 100000L).as("vec_id"), col("q_vec").as("vec"),
        col("q_norm").as("norm"))
      VectorOps.ivfAppend(twins, dir)

      val (lc, la) = VectorOps.loadIvfIndex(spark, dir)
      val grown = corpus.select("vec_id", "vec", "norm").unionByName(twins)
      val top1 = VectorOps.ivfSearch(queries, grown, lc, la)
        .filter(col("rk") === 1)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      queries.select("q_id").collect().map(_.getLong(0)).foreach { q =>
        assert(top1(q) == ((q + 100000L, 1.0)),
          s"query $q must find its appended twin at rank 1, got ${top1(q)}")
      }

      // drift probe: adversarial appends must decay the mean
      // assign-cosine, signalling a rebuild. The decisive construction is
      // a vector ORTHOGONAL to the whole centroid span (cosine ~0 to
      // every trained centroid, vs the ~0.2 corpus mean): on near-random
      // embeddings any mere direction flip still correlates ~±0.2 with
      // some centroid by chance and the comparison would ride on ulps.
      import spark.implicits._
      val buildHealth = VectorOps.ivfMeanAssignCosine(grown, lc, la)
      val cents = lc.collect().map(r =>
        r.getSeq[Double](r.fieldIndex("cvec")).toArray)
      // Gram-Schmidt: orthonormal basis of the centroid span, then strip
      // a deterministic seed vector's components in that span
      def dotA(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val basis = cents.foldLeft(List.empty[Array[Double]]) { (bs, c) =>
        val r = bs.foldLeft(c.clone()) { (v, b) =>
          val p = dotA(v, b); v.zip(b).map { case (x, y) => x - p * y } }
        val n = math.sqrt(dotA(r, r))
        if (n > 1e-9) (r.map(_ / n)) :: bs else bs
      }
      val rnd = new scala.util.Random(11)
      val seedVec = Array.fill(64)(rnd.nextGaussian())
      val perp = basis.foldLeft(seedVec) { (v, b) =>
        val p = dotA(v, b); v.zip(b).map { case (x, y) => x - p * y } }
      val perpNorm = math.sqrt(dotA(perp, perp))
      assert(perpNorm > 1e-9, "centroids must not span the full space")
      val hostile = (0 until 200).map { i =>
        val s = 1.0 + i / 1000.0
        (200000L + i, perp.toList.map(_ * s), perpNorm * s)
      }.toDF("vec_id", "vec", "norm")
      VectorOps.ivfAppend(hostile, dir)
      val (_, la2) = VectorOps.loadIvfIndex(spark, dir)
      val afterHealth = VectorOps.ivfMeanAssignCosine(
        grown.unionByName(hostile), lc, la2)
      assert(afterHealth < buildHealth,
        s"hostile appends must decay index health: $buildHealth -> $afterHealth")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("drift-triggered partial rebuild restores decayed buckets without touching healthy files") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_pr")
    val dir = root.toString + "/index"
    try {
      import spark.implicits._
      val corpus = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val (centroids, assignments) = VectorOps.ivfIndex(corpus)
      VectorOps.saveIvfIndex(centroids, assignments, dir)
      VectorOps.saveIvfBucketHealth(corpus, dir)

      assert(VectorOps.ivfPartialRebuild(corpus, dir).isEmpty,
        "an undrifted index must trigger no rebuild")

      // hostile appends concentrated by construction: scaled copies of the
      // NEGATED cid-0 centroid all share one direction, so they pollute
      // only the top-replica buckets for that direction
      val c0 = centroids.filter(col("cid") === 0).head()
      val c0vec = c0.getSeq[Double](c0.fieldIndex("cvec")).toList
      val c0norm = c0.getAs[Double]("cnorm")
      val hostile = (0 until 60).map { i =>
        val s = 1.0 + i / 1000.0
        (300000L + i, c0vec.map(v => -v * s), c0norm * s)
      }.toDF("vec_id", "vec", "norm")
      VectorOps.ivfAppend(hostile, dir)
      val grown = corpus.unionByName(hostile)

      val (lc1, la1) = VectorOps.loadIvfIndex(spark, dir)
      val polluted = la1.filter(col("vec_id") >= 300000L)
        .select("cid").distinct().collect().map(_.getInt(0)).toSet
      val decayedHealth = VectorOps.ivfMeanAssignCosine(grown, lc1, la1)

      def partFiles(): Map[String, Set[(String, Long, Long)]] =
        new java.io.File(s"$dir/assignments").listFiles()
          .filter(_.getName.startsWith("cid=")).map(d =>
            d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.length(), f.lastModified())).toSet).toMap
      val before = partFiles()

      val refBefore = spark.read.parquet(s"$dir/health")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

      val rebuilt = VectorOps.ivfPartialRebuild(grown, dir, tolerance = 0.1)
      assert(rebuilt.nonEmpty, "polluted buckets must cross the tolerance")
      assert(rebuilt.toSet.subsetOf(polluted),
        s"only polluted buckets may rebuild: $rebuilt vs $polluted")

      // the drift reference refreshes ONLY for rebuilt buckets: re-basing
      // healthy buckets onto their current (possibly slightly decayed)
      // value would ratchet the reference down and the probe could never
      // accumulate past tolerance
      val refAfter = spark.read.parquet(s"$dir/health")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      refBefore.keys.filterNot(rebuilt.contains).foreach(c =>
        assert(refBefore(c) == refAfter(c),
          s"healthy bucket $c's drift reference must be untouched"))

      val after = partFiles()
      val healthy = before.keySet.filterNot(k =>
        rebuilt.map(c => s"cid=$c").contains(k))
      healthy.foreach(k => assert(before(k) == after(k),
        s"healthy bucket $k files must be byte-identical after a partial rebuild"))
      rebuilt.foreach(c => assert(before(s"cid=$c") != after(s"cid=$c"),
        s"rebuilt bucket cid=$c must have rewritten files"))

      val (lc2, la2) = VectorOps.loadIvfIndex(spark, dir)
      val restored = VectorOps.ivfMeanAssignCosine(grown, lc2, la2)
      assert(restored > decayedHealth,
        s"partial rebuild must restore the drift metric: $decayedHealth -> $restored")
      assert(VectorOps.ivfPartialRebuild(grown, dir, tolerance = 0.1).isEmpty,
        "a freshly-rebuilt index must probe healthy again")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("wide-bucket split: only heavy buckets rewrite, members stay searchable, widths bounded") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_split")
    val dir = root.toString + "/index"
    try {
      import spark.implicits._
      val corpus = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val (centroids, assignments) = VectorOps.ivfIndex(corpus)
      VectorOps.saveIvfIndex(centroids, assignments, dir)
      VectorOps.saveIvfBucketHealth(corpus, dir)
      val maxCidBefore = centroids.agg(max("cid")).head().getInt(0)

      // bounded above every current width -> nothing to split
      assert(VectorOps.ivfSplitWideBuckets(corpus, dir, 100000L).isEmpty)

      // bloat ONE bucket: 150 directionally-jittered copies of cid 0's
      // centroid all assign to the same neighborhood, but their spread
      // is sub-clusterable (exact scaled copies would be one unsplittable
      // cosine direction)
      val c0 = centroids.filter(col("cid") === 0).head()
      val c0vec = c0.getSeq[Double](c0.fieldIndex("cvec")).toList
      val scale = c0.getAs[Double]("cnorm") / 64.0
      val bloat = (0 until 150).map { i =>
        val v = c0vec.zipWithIndex.map { case (x, j) =>
          x + 5.0 * scale * math.sin((i + 1.0) * (j + 1.0)) }
        (400000L + i, v, math.sqrt(v.map(x => x * x).sum))
      }.toDF("vec_id", "vec", "norm")
      VectorOps.ivfAppend(bloat, dir)
      val grown = corpus.unionByName(bloat)

      val (_, la1) = VectorOps.loadIvfIndex(spark, dir)
      val widths = la1.groupBy("cid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bound = 100L
      val wideExpected = widths.filter(_._2 > bound).keys.toSet
      assert(wideExpected.nonEmpty, "the bloat must create at least one wide bucket")

      def partSnapshot(): Map[String, Set[(String, Long)]] =
        new java.io.File(s"$dir/assignments").listFiles()
          .filter(_.getName.startsWith("cid=")).map(d =>
            d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.lastModified())).toSet).toMap
      val before = partSnapshot()

      // replicas=1 isolates the Voronoi partitioning from the replica
      // redundancy (a central sub-centroid lands in every member's top-2,
      // so replicated widths can't show the split's balance)
      val split = VectorOps.ivfSplitWideBuckets(grown, dir, bound, assignReplicas = 1)
      assert(split.toSet == wideExpected, s"split $split vs wide $wideExpected")

      val (lc2, la2) = VectorOps.loadIvfIndex(spark, dir)
      // new sub-bucket cids extend past the previous maximum
      assert(lc2.agg(max("cid")).head().getInt(0) > maxCidBefore,
        "splitting must mint fresh cids for the extra sub-buckets")
      // live buckets (those with a centroid) are all under ~the bound;
      // replicas can double-count members, so check the primary width by
      // distinct vec_ids per live cid
      val liveCids = lc2.select("cid").collect().map(_.getInt(0)).toSet
      val liveWidths = la2.filter(col("cid").isin(liveCids.toSeq.map(Int.box): _*))
        .groupBy("cid").agg(countDistinct("vec_id").as("w")).collect()
        .map(_.getLong(1))
      assert(liveWidths.max <= 2 * bound,
        s"split buckets must land near the bound, got max ${liveWidths.max}")
      // untouched buckets' files stay byte-identical
      val after = partSnapshot()
      val rewritten = after.keySet.filter(k => before.get(k).forall(_ != after(k)))
      before.keySet.filterNot(k => split.contains(k.stripPrefix("cid=").toInt))
        .filterNot(k => rewritten.contains(k))
        .foreach(k => assert(before(k) == after(k)))
      assert(rewritten.forall(k =>
        !before.contains(k) || split.contains(k.stripPrefix("cid=").toInt)),
        s"only split/new partitions may change, changed: $rewritten")

      // every bloat member is still findable: search its own vector
      val probeQ = bloat.limit(3).select(col("vec_id").as("q_id"),
        col("vec").as("q_vec"), col("norm").as("q_norm"))
      val hits = VectorOps.ivfSearch(probeQ, grown, lc2, la2, numProbes = 8)
        .filter(col("rk") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      hits.foreach { case (q, c) => assert(q == c,
        s"query $q must find itself at rank 1 after the split, got $c") }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("adaptive multi-probe: candidate budget recovers post-append recall with bounded extra reads") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_mp")
    val dir = root.toString + "/index"
    try {
      import spark.implicits._
      // double-cast vectors so driver-side twin construction and the
      // engine agree bit-for-bit on every cosine
      val all = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
      val queries = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
      val corpus = all.filter(col("vec_id") >= 10).select("vec_id", "vec", "norm")
      // replicas=1: boundary spill would mask the staleness this test plants
      val (centroids, assignments) = VectorOps.ivfIndex(corpus, assignReplicas = 1)
      VectorOps.saveIvfIndex(centroids, assignments, dir)

      def bruteTop5(corp: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
        val cos = VectorOps.dot(col("q_vec"), col("vec")) / (col("q_norm") * col("norm"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
        corp.crossJoin(broadcast(queries))
          .select(col("q_id"), col("vec_id"), cos.as("cos"))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
          .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
      }
      def recallOf(res: org.apache.spark.sql.DataFrame, truth: Set[(Long, Long)]): Double = {
        val got = res.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
        (got & truth).size.toDouble / truth.size
      }

      val freshTruth = bruteTop5(corpus)
      val rFresh = recallOf(
        VectorOps.ivfSearch(queries, corpus, centroids, assignments), freshTruth)

      // Hostile-but-realistic append: per query, two twins mixed toward
      // the query's rank-10 and rank-13 centroid DIRECTIONS (1.5·ĉ + 1.0·q̂).
      // The centroid component pins ivfAppend's nearest-centroid assignment
      // to a bucket the fixed 8-probe search never reads for that query,
      // while the query component keeps cos(q, twin) ≈ 0.58 — above the
      // ~0.51 background max of these near-random embeddings, so each twin
      // is its query's true nearest neighbor. That is exactly the
      // post-append failure mode: the index is consistent, but fresh data
      // sits in buckets the fresh-tuned probe count no longer reaches.
      val cRows = centroids.collect().map(r => (r.getAs[Int]("cid"),
        r.getSeq[Double](r.fieldIndex("cvec")).toArray, r.getAs[Double]("cnorm")))
      val qRows = queries.collect().map(r => (r.getAs[Long]("q_id"),
        r.getSeq[Double](r.fieldIndex("q_vec")).toArray, r.getAs[Double]("q_norm")))
      def dotA(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      // (cos desc, cid asc) — the kernel's exact ranking
      def rankedFor(qv: Array[Double], qn: Double) = cRows
        .map { case (cid, cv, cn) => (cid, cv, cn, dotA(qv, cv) / (qn * cn)) }
        .sortBy { case (cid, _, _, cos) => (-cos, cid) }
      val intended = scala.collection.mutable.Map.empty[Long, Int]
      val qTop8 = qRows.map { case (qid, qv, qn) =>
        qid -> rankedFor(qv, qn).take(8).map(_._1).toSet }.toMap
      val twinRows = qRows.flatMap { case (qid, qv, qn) =>
        val ranked = rankedFor(qv, qn)
        Seq(9, 12).zipWithIndex.map { case (rank, j) =>
          val (cid, cv, cn, _) = ranked(rank)
          val v = cv.indices.map(i => 1.5 * cv(i) / cn + 1.0 * qv(i) / qn).toArray
          val id = 900000L + qid * 10 + j
          intended(id) = cid
          (id, v.toSeq, math.sqrt(dotA(v, v)))
        }
      }.toSeq
      val twins = twinRows.toDF("vec_id", "vec", "norm")
      VectorOps.ivfAppend(twins, dir, assignReplicas = 1)
      val (lc, la) = VectorOps.loadIvfIndex(spark, dir)

      // construction check: every twin landed in its intended bucket,
      // outside its query's fixed-8 probe set
      val landed = la.filter(col("vec_id") >= 900000L).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
      twinRows.foreach { case (id, _, _) =>
        assert(landed(id) == intended(id),
          s"twin $id was meant for bucket ${intended(id)}, landed in ${landed(id)}")
        assert(!qTop8((id - 900000L) / 10)(landed(id)),
          s"twin $id must sit outside its query's top-8 buckets")
      }

      val grown = corpus.unionByName(twins)
      val grownTruth = bruteTop5(grown)
      twinRows.foreach { case (id, _, _) =>
        assert(grownTruth(((id - 900000L) / 10, id)),
          s"twin $id must be in its query's true top-5 after the append")
      }

      val rStale = recallOf(VectorOps.ivfSearch(queries, grown, lc, la), grownTruth)
      assert(rStale < rFresh,
        s"planted twins must sag fixed-probe recall: fresh $rFresh, stale $rStale")

      // budget sized from the index itself: enough members to push every
      // query past its rank-13 bucket (where the deepest twin sits)
      val widths = la.groupBy("cid").count().collect()
        .map(r => r.getAs[Int]("cid") -> r.getAs[Long]("count")).toMap
      val budget = qRows.map { case (_, qv, qn) =>
        rankedFor(qv, qn).take(12).map(t => widths.getOrElse(t._1, 0L)).sum
      }.max.toInt + 1
      val rAdapt = recallOf(VectorOps.ivfSearchAdaptive(
        queries, grown, lc, la, minCandidates = budget, maxProbes = 16), grownTruth)
      assert(rAdapt >= rFresh,
        s"adaptive probing must recover to the fresh-index figure: fresh $rFresh, adaptive $rAdapt")

      // bounded extra reads: per query, never more than maxProbes buckets,
      // and dropping the last probed bucket always lands back under budget
      // (i.e. the expansion stopped at the first budget-crossing bucket)
      val plan = VectorOps.ivfAdaptiveProbes(queries, lc, la,
        minCandidates = budget, maxProbes = 16).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("probe_rank"), r.getAs[Long]("bucket_n")))
      plan.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.length <= 16, s"query $q probed ${rows.length} > maxProbes buckets")
        val total = rows.map(_._3).sum
        val last = rows.maxBy(_._2)._3
        assert(total - last < budget,
          s"query $q read $total candidates with last bucket $last — expansion overshot the $budget budget")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("blocked near-dup: high recall on planted near-dups at a fraction of the candidates") {
    import spark.implicits._
    // 150 random base vectors + 150 perturbed copies (cos ~ 0.98), one label
    // block — so pruning must come entirely from the banded hyperplane sigs
    val rnd = new scala.util.Random(123)
    val base = (0 until 150).map(i => (i.toLong, 0, Array.fill(64)(rnd.nextGaussian())))
    val planted = base.map { case (id, l, v) =>
      (id + 1000L, l, v.map(x => x + rnd.nextGaussian() * 0.2))
    }
    val vecs = (base ++ planted).map { case (id, l, v) => (id, l, v.toSeq) }
      .toDF("vec_id", "label", "vec")
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    // exact within-label pairs at theta=0.8 (brute force ground truth)
    val cos = VectorOps.dot(col("a.vec"), col("b.vec")) / (col("a.norm") * col("b.norm"))
    val exact = vecs.as("a")
      .join(vecs.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), round(cos, 6).as("cos"))
      .filter(col("cos") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 140, s"plant should create ~150 near-dup pairs, got ${exact.size}")
    val blocked = VectorOps.embedNeardupBlocked(vecs, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(blocked.subsetOf(exact), "exact-cosine filter admits no false positives")
    val recall = (blocked & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall on planted near-dups")
    // candidate volume: threshold < -1 returns every blocked candidate pair
    val candidates = VectorOps.embedNeardupBlocked(vecs, threshold = -2.0).count()
    val allPairs = 300L * 299L / 2
    assert(candidates < allPairs / 10,
      s"$candidates candidates vs $allPairs brute-force pairs — blocking must prune >90%")
  }

  test("hardNegatives: different-label top-k, hard/semihard/easy bands vs hardest positive, null-safe lone label") {
    import spark.implicits._
    val emb = Seq(
      (0L, "A", Array(1f, 0f)),   // anchor 0
      (1L, "Z", Array(0f, 1f)),   // anchor 1: label Z appears nowhere else
      (10L, "A", Array(1f, 0f)),  // anchor 0's positive, cos 1.0
      (11L, "B", Array(1f, 1f)),  // cos 1/sqrt(2) to anchor 0 -> easy
      (12L, "B", Array(1f, 0f)),  // cos 1.0 to anchor 0 -> HARD (>= positive)
      (13L, "B", Array(0f, 1f)),  // cos 0 to anchor 0
      (14L, "B", Array(3f, 1f))   // cos 3/sqrt(10)=.948683 -> SEMIHARD band
    ).toDF("vec_id", "label", "embedding")
    val out = VectorOps.hardNegatives(emb, k = 5, querySpan = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r).toMap
    // anchor 0: hardest positive is id10 at cos 1.0 -> pos_cos_pp6 = 1000000
    val a0 = out((0L, 1L))
    assert(a0.getLong(2) == 12L && a0.getDouble(3) == 1.0 &&
      a0.getLong(5) == 1000000L && a0.getString(6) == "hard",
      s"anchor0 rk1: a negative AT the positive is hard, not semihard: $a0")
    assert(out((0L, 2L)).getLong(2) == 14L &&
      out((0L, 2L)).getDouble(3) == 0.948683 &&
      out((0L, 2L)).getString(6) == "semihard",
      s"anchor0 rk2 sits strictly inside the margin band: ${out((0L, 2L))}")
    assert(out((0L, 3L)).getLong(2) == 11L &&
      out((0L, 3L)).getString(6) == "easy", s"anchor0 rk3: ${out((0L, 3L))}")
    // cos-0 ties rank by id: anchor 1 (vec_id 1) before id13
    assert(out((0L, 4L)).getLong(2) == 1L && out((0L, 5L)).getLong(2) == 13L)
    // anchor 1: label Z is unique -> no positive, null pos/band; its
    // negatives still rank (id13 cos 1.0 first, then id11, id14, ties by id)
    val a1 = out((1L, 1L))
    assert(a1.getLong(2) == 13L && a1.isNullAt(5) && a1.isNullAt(6), s"$a1")
    assert(out((1L, 2L)).getLong(2) == 11L && out((1L, 3L)).getLong(2) == 14L)
    assert(Seq(out((1L, 4L)), out((1L, 5L))).map(_.getLong(2)) == Seq(0L, 10L),
      "cos-0 ties break ascending by candidate id; k=5 cuts the last tie")
    intercept[IllegalArgumentException](VectorOps.hardNegatives(emb, k = 0))
    // scale pins: queries broadcast against the streamed corpus on both
    // passes, and no stage funnels the scored volume into one partition
    val plan = VectorOps.q143HardNegatives(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"queries must broadcast:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition funnel over scored volume:\n$plan")
  }

  test("hyperplane LSH signature is stable and buckets identical vectors together") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Array.tabulate(64)(i => (i % 7).toFloat)),
      (2L, 0, Array.tabulate(64)(i => (i % 7).toFloat)),
    ).toDF("vec_id", "label", "embedding")
    val sigs = df.select(col("vec_id"),
        VectorOps.lshSignature(VectorOps.asDouble(col("embedding"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
  }

  test("int8Quantize: planted codes, tinyint storage, zero-vector guard") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f), 0),
    ).toDF("vec_id", "embedding", "label")
    val quant = VectorOps.int8Quantize(df)
    // the 4× claim is real only if the codes are BYTES on disk
    assert(quant.schema("q").dataType.asInstanceOf[ArrayType].elementType
      == ByteType)
    val rows = quant.orderBy("vec_id").collect()
    // m=1 → scale=1/127; 1.0→127 (saturates exactly, never overflows),
    // -0.5→-63 (floor(-63.5+0.5)), 0.25→32 (round up), 0→0
    assert(rows(0).getAs[scala.collection.Seq[Byte]]("q").toSeq
      == Seq[Byte](127, -63, 32, 0))
    assert(math.abs(rows(0).getAs[Double]("scale") - 1.0 / 127) < 1e-15)
    // zero vector: scale 0 + all-zero codes, not a divide-by-zero
    assert(rows(1).getAs[Double]("scale") == 0.0)
    assert(rows(1).getAs[scala.collection.Seq[Byte]]("q").forall(_ == 0))
  }

  test("q106: stats match an independent driver-side recomputation, zero exchanges") {
    val res = VectorOps.q106Int8Quantize(spark, sfDir)
    // one scan, per-row arithmetic only — a shuffle here would mean the
    // quantizer stopped being embarrassingly parallel
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q106 must not shuffle:\n$plan")
    val got = res.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // mirror the exact arithmetic (left-to-right folds, floor-rounding)
    val exp = graft.sources.Tables.embeddings(spark, sfDir).collect().flatMap { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").toSeq.map(_.toDouble)
      val s = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x))) / 127.0
      if (s <= 0) None else {
        val err = v.map(x => x - math.floor(x / s + 0.5) * s)
        val mse = err.foldLeft(0.0)((a, e) => a + e * e) / err.length
        val mx = err.foldLeft(0.0)((a, e) => math.max(a, math.abs(e)))
        val zeros = v.count(x => math.floor(x / s + 0.5) == 0.0)
        Some((r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
          math.floor(s * 1e9 + 0.5).toLong, math.floor(mse * 1e12 + 0.5).toLong,
          math.floor(mx * 1e9 + 0.5).toLong, zeros.toLong))
      }
    }.toSet
    assert(got == exp)
    // reconstruction error is bounded by half a quantization step per dim
    got.foreach { case (id, _, scale9, _, maxErr9, _) =>
      assert(maxErr9 <= scale9 / 2 + 1, s"vec $id: max err $maxErr9 vs scale $scale9")
    }
  }

  test("q107: int8 top-5 per query, rank-consistent, high recall vs the exact ranking") {
    val res = VectorOps.q107Int8Topk(spark, sfDir)
    val rows = res.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to 5L))
      val c = sorted.map(_.getAs[Long]("cos8_pp6"))
      assert(c.zip(c.tail).forall { case (a, b) => a >= b },
        s"quantized cosine must be non-increasing in rank: ${c.toSeq}")
    }
    // the instrument: int8 must preserve nearly all of the true top-5
    // (0.98 at sf0.01; anything under 0.8 means the quantizer broke)
    val hits = rows.count(r => !r.isNullAt(r.fieldIndex("exact_rk")))
    assert(hits >= 40, s"recall@5 ${hits / 50.0} — int8 ranking degraded")
    // agreeing rows carry BOTH ranks; where both exist at rank 1 they
    // overwhelmingly coincide (the argmax survives quantization)
    val rank1Agree = rows.count(r => r.getAs[Long]("rk") == 1L &&
      !r.isNullAt(r.fieldIndex("exact_rk")) && r.getAs[Long]("exact_rk") == 1L)
    assert(rank1Agree >= 8, s"only $rank1Agree/10 argmaxes survived int8")
    graft.CacheHygiene.releaseTree(res)
  }

  test("kmeansAssign: planted two-mass corpus converges to the mass split, exact dist2") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(10.0f, 0.0f), 0),
      (2L, Seq(0.1f, 0.0f), 0), (3L, Seq(-0.1f, 0.0f), 0),
      (4L, Seq(10.1f, 0.0f), 0), (5L, Seq(9.9f, 0.0f), 0),
    ).toDF("vec_id", "embedding", "label")
    val res = VectorOps.kmeansAssign(df, k = 2, iters = 2)
    val got = res.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // seeds are ids 0 (origin) and 1 (at x=10); after one recompute the
    // centroids sit at the exact integer mass centers (0,0) and (10,0)
    assert(Seq(0L, 2L, 3L).forall(got(_)._1 == 0L))
    assert(Seq(1L, 4L, 5L).forall(got(_)._1 == 1L))
    assert(got(0L)._2 == 0L)
    assert(got(2L)._2 == 100000L * 100000L) // 0.1 in 1e-6 fixed point, squared
    graft.CacheHygiene.releaseTree(res)
  }

  test("kmeansAssign: duplicate seeds tie to the smaller cid; the emptied cluster carries over") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0.0f, 0.0f), 0),
      (1L, Seq(5.0f, 5.0f), 0),
      (2L, Seq(5.0f, 5.0f), 0), // identical to seed 1: its own cluster empties
    ).toDF("vec_id", "embedding", "label")
    val res = VectorOps.kmeansAssign(df, k = 3, iters = 2)
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
    graft.CacheHygiene.releaseTree(res)
  }

  test("q108: partitioning-independent (repartitioned input, identical labels and distances)") {
    val a = VectorOps.q108Kmeans(spark, sfDir)
    val b = VectorOps.kmeansAssign(
      graft.sources.Tables.embeddings(spark, sfDir).repartition(7), k = 8, iters = 2)
    val sa = a.collect().map(_.toString).sorted
    val sb = b.collect().map(_.toString).sorted
    assert(sa.sameElements(sb))
    assert(a.select("cluster").distinct().count() == 8)
    graft.CacheHygiene.releaseTree(a, b)
  }

  test("q110: cluster card agrees with q108's assignment, recomputed driver-side") {
    val card = VectorOps.q110ClusterCard(spark, sfDir)
    val got = card.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val assign = VectorOps.q108Kmeans(spark, sfDir)
    val exp = assign.collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rows) =>
        val ds = rows.map(_._2)
        c -> (ds.length.toLong,
          math.floor(ds.map(BigInt(_)).sum.toDouble / ds.length).toLong,
          ds.max)
      }
    assert(got == exp)
    assert(got.values.map(_._1).sum == 500L)
    graft.CacheHygiene.releaseTree(card, assign)
  }

  test("semDedup: planted twins drop the larger id at tau=0.95, orthogonal mates survive") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
      (2L, Seq(1.0f, 0.001f), 0), // twin of 0
      (3L, Seq(0.0f, 1.001f), 0), // twin of 1
    ).toDF("vec_id", "embedding", "label")
    val res = VectorOps.semDedup(df, k = 1, iters = 1, tau = 0.95)
    val got = res.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
    graft.CacheHygiene.releaseTree(res)
  }

  test("targetSelect: pool scores exact cosine against the exemplar centroid, zero vectors sit out") {
    import spark.implicits._
    // exemplars 0,1 point +x (centroid = +x); pool: aligned / opposed /
    // orthogonal / zero
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.0f, 0.0f), 0),
      (10L, Seq(0.5f, 0.0f), 0),   // cos +1
      (11L, Seq(-2.0f, 0.0f), 0),  // cos -1
      (12L, Seq(0.0f, 3.0f), 0),   // cos 0
      (13L, Seq(0.0f, 0.0f), 0)    // zero vector: excluded
    ).toDF("vec_id", "embedding", "label")
    val out = VectorOps.targetSelect(df, col("vec_id") < 2)
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(10L, 11L, 12L), "exemplars and zero vectors never emit")
    assert(got(10L) == ((1000000L, true)))
    assert(got(11L) == ((-1000000L, false)))
    assert(got(12L) == ((0L, false)))
    graft.CacheHygiene.releaseTree(out)
  }

  test("q112: scoring is an Exchange-free scan over the centroid literal") {
    val res = VectorOps.q112TargetSelect(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q112 scoring must not shuffle:\n$plan")
    assert(res.count() > 0)
    graft.CacheHygiene.releaseTree(res)
  }

  test("targetSelect: empty exemplar set and zero centroid refuse loudly") {
    import spark.implicits._
    val df = Seq((5L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      VectorOps.targetSelect(df, col("vec_id") < 0).collect()
    }
    val zeroEx = Seq((0L, Seq(0.0f, 0.0f), 0), (5L, Seq(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      VectorOps.targetSelect(zeroEx, col("vec_id") < 2).collect()
    }
  }

  test("knnPurity: pure cluster scores 1.0, planted intruder dilutes exactly, self excluded") {
    import spark.implicits._
    // two tight clusters in 2-D: label 0 around (1,0), label 1 around
    // (0,1). Query 0's 3-NN under k=3 are its 3 cluster mates -> purity
    // 1.0. Query 1 (label 1) sits INSIDE cluster 0 (mislabeled point):
    // its 3-NN are all label 0 -> purity 0.0 - the signal the metric
    // exists to surface.
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1.00, 0.00), 0), (1L, v(0.99, 0.14), 1), // intruder
      (2L, v(0.98, 0.02), 0), (3L, v(0.97, 0.03), 0), (4L, v(0.99, 0.01), 0),
      (10L, v(0.00, 1.00), 1), (11L, v(0.02, 0.98), 1), (12L, v(0.03, 0.97), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.knnPurity(emb, k = 3, querySpan = 2L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(0L) == ((3L, 3L, 1.0)), s"pure cluster: ${got(0L)}")
    assert(got(1L) == ((3L, 0L, 0.0)), s"intruder sees only the other label: ${got(1L)}")
    // leave-one-out: nobody is their own neighbor (n_neighbors == k even
    // though the query is in the corpus frame)
    assert(got.values.forall(_._1 == 3L))
  }

  test("cosineCalibration: orthogonal clusters separate exactly, each pair counted once") {
    import spark.implicits._
    // two orthogonal axes: same-label pairs land in bucket 20
    // (cos = 1.0 exactly), cross-label pairs in bucket 0 (cos = 0.0).
    // vec_id > q_id means pairs count once and self-pairs never.
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1, 0), 0), (1L, v(0, 1), 1),
      (10L, v(1, 0), 0), (11L, v(0, 1), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.cosineCalibration(emb, querySpan = 2L, bins = 20)
      .collect()
      .map(r => (r.getBoolean(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // q0 pairs: (0,1) diff/0, (0,10) same/20, (0,11) diff/0
    // q1 pairs: (1,10) diff/0, (1,11) same/20
    assert(got == Map(
      (true, 20L) -> ((2L, 1.0)),
      (false, 0L) -> ((3L, 1.0))), s"got $got")
  }

  test("knnPurity plan: queries broadcast, no window over the scored volume") {
    val out = VectorOps.q122KnnPurity(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query set must broadcast:\n$plan")
    assert(!plan.contains("SinglePartition"), "no global window allowed")
    assert(out.count() > 0)
  }

  test("pqCodes: planted corpus codes each subspace independently, exact distortions") {
    import spark.implicits._
    // q-space (floats are n·1e-6): dims=4, m=2 → subspaces (p1,p2) and
    // (p3,p4); k=2 seeds are vec_ids 0 and 1. After one integer Lloyd
    // recompute the ss0 centroids are (1,0)/(9,0) and the ss1 centroids
    // (0,1)/(0,8) — every code and d2 below is hand-derived from those.
    // v4 is the POINT of PQ: near code 0 in ss0 but code 1 in ss1, a
    // cross-product cell no single-space k-means (q108) can express.
    def v(a: Long, b: Long, c: Long, d: Long) =
      Seq(a * 1e-6f, b * 1e-6f, c * 1e-6f, d * 1e-6f)
    val df = Seq(
      (0L, v(0, 0, 0, 0), 0), (1L, v(10, 0, 0, 10), 0),
      (2L, v(2, 0, 0, 2), 0), (3L, v(8, 0, 0, 8), 0),
      (4L, v(2, 0, 0, 8), 0),
    ).toDF("vec_id", "embedding", "label")
    val res = VectorOps.pqCodes(df, m = 2, k = 2, iters = 2)
    val got = res.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      0L -> ((0L, 1L, 0L, 1L, 2L)),
      1L -> ((1L, 1L, 1L, 4L, 5L)),
      2L -> ((0L, 1L, 0L, 1L, 2L)),
      3L -> ((1L, 1L, 1L, 0L, 1L)),
      4L -> ((0L, 1L, 1L, 0L, 1L))), s"got $got")
    graft.CacheHygiene.releaseTree(res)
  }

  test("pqCodes: uneven dims/m split and empty input refuse loudly") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0f, 2.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      VectorOps.pqCodes(df, m = 2, k = 1, iters = 1).collect()
    }
    val empty = df.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      VectorOps.pqCodes(empty, m = 1, k = 1, iters = 1).collect()
    }
  }

  test("q129: partitioning-independent (repartitioned input, identical codes and distortions)") {
    val a = VectorOps.q129PqCodes(spark, sfDir)
    val b = VectorOps.pqCodes(
      graft.sources.Tables.embeddings(spark, sfDir).repartition(7))
    val sa = a.collect().map(_.toString).sorted
    val sb = b.collect().map(_.toString).sorted
    assert(sa.sameElements(sb))
    assert(sa.length == 500)
    graft.CacheHygiene.releaseTree(a, b)
  }

  test("q130: ADC top-5 per query, rank-consistent, high recall vs the exact ranking") {
    val res = VectorOps.q130PqTopk(spark, sfDir)
    val rows = res.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to 5L))
      val d = sorted.map(_.getAs[Long]("adc_d2"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        s"ADC distance must be non-decreasing in rank: ${d.toSeq}")
    }
    // The near-uniform synthetic embeddings are PQ's documented worst
    // case (distance gaps ≪ quantization error); the PqProbe grid sweep
    // measured recall@5 0.48 at q130's 16×64 — the floor here guards
    // the ADC arithmetic (a broken lookup/ranking lands ≈0.1, the
    // tie-break baseline), not the compression's intrinsic ceiling.
    val hits = rows.count(r => !r.isNullAt(r.fieldIndex("exact_rk")))
    assert(hits >= 18, s"recall@5 ${hits / 50.0} — ADC ranking degraded")
    graft.CacheHygiene.releaseTree(res)
  }

  test("q131: IVF-PQ top-5 per query — rank-consistent, candidates only from probed lists") {
    // explicit nProbe=2: the containment assertion below (≤2 ccids per
    // query) is only meaningful under partial probing — the DEFAULT is
    // AUTO (ivfpqAutoProbes: all 8 lists at this toy kc, ~30% at
    // production kc), which the next test and the resolver test pin
    val res = VectorOps.ivfpqTopk(
      graft.sources.Tables.embeddings(spark, sfDir), nProbe = 2)
    val rows = res.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to 5L))
      val d = sorted.map(_.getAs[Long]("adc_d2"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        s"ADC distance must be non-decreasing in rank: ${d.toSeq}")
      // every query probes nProbe=2 lists, so its results span ≤2 ccids
      assert(g.map(_.getAs[Long]("ccid")).distinct.length <= 2,
        "results must come from the probed lists only")
    }
    // End-to-end recall floor: measured 0.34 at this grid — on the
    // near-uniform synthetic embeddings the coarse lists overlap so
    // heavily that residuals don't concentrate (the PqProbe sweep shows
    // nProbe=2 ≡ nProbe=8 at 0.34: routing is near-lossless, the
    // residual-PQ distortion is the whole gap). The floor guards the
    // routing+ADC arithmetic (broken ≈ 0.1, the tie-break baseline),
    // not Jégou's clustered-data gains, which this corpus cannot show.
    val hits = rows.count(r => !r.isNullAt(r.fieldIndex("exact_rk")))
    assert(hits >= 13, s"recall@5 ${hits / 50.0} — IVF-PQ serving degraded")
    graft.CacheHygiene.releaseTree(res)
  }

  test("q131: full-probe IVF-PQ (nProbe=kc) ranks every list — routing can hide nothing") {
    // with nProbe = kc the candidate set is the whole corpus, so any
    // (q, c) pair the plain-PQ formulation would rank must appear here
    // too; ranks then differ from q130's only through residual-vs-plain
    // codebooks, never through routing. Pin the structural guarantee:
    // 10 queries × 5 ranks, all ccids permitted, ADC non-decreasing.
    // This is also the DEFAULT at this toy kc — AUTO resolves to 8/8
    // (the registered q131 probes every list; recall can hide nothing
    // at gate scale, and the ~30% fraction only engages at real kc).
    assert(VectorOps.ivfpqAutoProbes(8) == 8)
    assert(VectorOps.ivfpqAutoProbes(1024) == 308,
      "production kc must resolve to the ~30% fraction, not the floor")
    assert(VectorOps.ivfpqAutoProbes(4) == 4,
      "AUTO must clamp to kc — probing a list twice is meaningless")
    val res = VectorOps.ivfpqTopk(
      graft.sources.Tables.embeddings(spark, sfDir), nProbe = 8)
    val rows = res.collect()
    assert(rows.length == 50)
    assert(rows.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
    graft.CacheHygiene.releaseTree(res)
  }

  test("ivfpqTopk plan: probe side broadcasts onto the streamed code corpus, no global window") {
    val res = VectorOps.ivfpqTopk(
      graft.sources.Tables.embeddings(spark, sfDir))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"probe/instrument sides must broadcast:\n$plan")
    assert(!plan.contains("SinglePartition"), "no global window allowed")
    assert(res.count() > 0)
    graft.CacheHygiene.releaseTree(res)
  }

  test("ivfpqTopk deployable form: dropping the instrument changes no ranking, only the column") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val full = VectorOps.ivfpqTopk(df).drop("exact_rk")
    val prod = VectorOps.ivfpqTopk(df, instrument = false)
    assert(prod.columns.toSeq ==
      Seq("q_id", "c_id", "ccid", "rk", "adc_d2"))
    assert(full.collect().map(_.toString).sorted
      .sameElements(prod.collect().map(_.toString).sorted))
    graft.CacheHygiene.releaseTree(full, prod)
  }

  test("ivfpqTopk: partitioning-independent and loud on bad nProbe") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val a = VectorOps.ivfpqTopk(df)
    val b = VectorOps.ivfpqTopk(df.repartition(7))
    assert(a.collect().map(_.toString).sorted
      .sameElements(b.collect().map(_.toString).sorted))
    intercept[IllegalArgumentException] {
      VectorOps.ivfpqTopk(df, kc = 4, nProbe = 5)
    }
    graft.CacheHygiene.releaseTree(a, b)
  }

  test("ivfpqBuild + ivfpqSearch: the persisted index serves complete, deterministic rankings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    VectorOps.ivfpqBuild(df.filter(col("vec_id") >= 10), dir,
      kc = 8, m = 16, k = 64)
    val served = VectorOps.ivfpqSearch(spark, dir,
      df.filter(col("vec_id") < 10), nProbe = 8, kNN = 5)
    val rows = served.collect()
    assert(rows.groupBy(_.getAs[Long]("q_id")).size == 10)
    assert(rows.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
    // determinism: a second search returns the identical ranking
    val again = VectorOps.ivfpqSearch(spark, dir,
      df.filter(col("vec_id") < 10), nProbe = 8, kNN = 5).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("persisted index ranks identically to the one-shot ivfpqTopk") {
    // ivfpqTopk trains geometry on queries + corpus together and indexes
    // only vec_id >= querySpan; the equivalent persisted build therefore
    // trains on the FULL frame (trainOn) and appends only the corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_eq").toString
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    VectorOps.ivfpqBuild(df.filter(col("vec_id") >= 10L), dir,
      kc = 8, m = 16, k = 64, trainOn = df)
    val served = VectorOps.ivfpqSearch(spark, dir,
        df.filter(col("vec_id") < 10L), nProbe = 2, kNN = 5)
      .select("q_id", "c_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = VectorOps.ivfpqTopk(df, kc = 8, m = 16, k = 64,
        nProbe = 2, kNN = 5, querySpan = 10L, instrument = false)
      .select("q_id", "c_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == oneShot,
      s"persisted-index ranking must equal the one-shot form:\n" +
        s"served-only=${(served -- oneShot).take(5)}\n" +
        s"oneshot-only=${(oneShot -- served).take(5)}")
    // and the served schema carries ccid as BIGINT like every other
    // surface (partition-dir inference would have said INT)
    val servedDf = VectorOps.ivfpqSearch(spark, dir,
      df.filter(col("vec_id") < 3L), nProbe = 2, kNN = 5)
    assert(servedDf.schema("ccid").dataType ==
      org.apache.spark.sql.types.LongType,
      s"ccid must serve as BIGINT: ${servedDf.schema("ccid").dataType}")
  }

  test("ivfpqSearch plan: probing reads only the probed list partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq2").toString
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    VectorOps.ivfpqBuild(df, dir, kc = 8, m = 8, k = 16)
    val served = VectorOps.ivfpqSearch(spark, dir,
      df.filter(col("vec_id") < 3), nProbe = 2, kNN = 5)
    val scan = served.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("ccid"),
      s"the list read must carry a ccid partition filter:\n$scan")
    // ≤ queries×nProbe distinct lists are readable — the files actually
    // touched must be a strict subset of the 8 list directories
    val touched = served.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n")).mkString
    assert(served.count() > 0)
    val allLists = new java.io.File(s"$dir/lists").listFiles()
      .count(_.getName.startsWith("ccid="))
    assert(allLists == 8, s"expected 8 list partitions, got $allLists")
  }

  test("ivfpqAppend: frozen-geometry growth — an appended twin serves at rank 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq3").toString
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    VectorOps.ivfpqBuild(df.filter(col("vec_id") >= 10), dir,
      kc = 4, m = 8, k = 16)
    // append an exact copy of query 0's vector under a new id: its ADC
    // distance to the query is its own recon distortion — the smallest
    // possible — so it must serve at rank 1
    val twin = df.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    VectorOps.ivfpqAppend(twin, dir)
    val top = VectorOps.ivfpqSearch(spark, dir, df.filter(col("vec_id") === 0L),
      nProbe = 4, kNN = 3).collect().sortBy(_.getAs[Long]("rk"))
    assert(top.head.getAs[Long]("c_id") == 100000L,
      s"the appended twin must rank first, got ${top.toSeq}")
    // geometry untouched by the append: a missing geometry is loud
    val e = intercept[IllegalArgumentException](
      VectorOps.ivfpqAppend(twin, s"$dir/nope"))
    assert(e.getMessage.contains("writeGeometry"))
  }

  test("pqCodebooks: fused one-scan-per-round training ≡ per-subspace Lloyd on slices") {
    import spark.implicits._
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val iv = df.select(col("vec_id"),
      VectorOps.intVec(col("embedding")).as("q")).localCheckpoint(true)
    for ((m, k, it) <- Seq((2, 4, 2), (4, 3, 3))) {
      val fused = VectorOps.pqCodebooks(iv, m, k, it, 64)
      val sub = 64 / m
      val perSlice = (0 until m).map { j =>
        VectorOps.lloydCentroids(
          iv.select(col("vec_id"),
            slice(col("q"), j * sub + 1, sub).as("q")), k, it)
      }
      assert(fused.map(_.map { case (c, a) => c -> a.toSeq }) ==
        perSlice.map(_.map { case (c, a) => c -> a.toSeq }),
        s"fused/per-slice codebooks diverged at m=$m k=$k iters=$it")
    }
    graft.CacheHygiene.releaseTree(iv)
  }

  test("rrfFuse: exact integer fusion, one-list docs keep their single contribution") {
    import spark.implicits._
    // q=1: semantic list ranks c100 then c101; lexical ranks c101 then
    // c102 — c101 (in BOTH) must fuse first with the exact nano-unit sum
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("q_id", "c_id", "rk")
    val b = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("q_id", "c_id", "rk")
    val got = VectorOps.rrfFuse(a, b).collect()
      .sortBy(_.getAs[Long]("rk"))
      .map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("rrf_u")))
    val p61 = 1000000000L / 61; val p62 = 1000000000L / 62
    assert(got.toSeq == Seq((101L, p61 + p62), (100L, p61), (102L, p62)),
      s"fusion order/arithmetic wrong: ${got.toSeq}")
  }

  test("q147: RRF fusion — contiguous ranks, monotone scores, members from the stage lists") {
    val rows = VectorOps.q147RrfFusion(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to 10L))
      val u = sorted.map(_.getAs[Long]("rrf_u"))
      assert(u.zip(u.tail).forall { case (x, y) => x >= y },
        s"rrf_u must be non-increasing in rank: ${u.toSeq}")
    }
    // membership + arithmetic: every fused row's score is exactly the
    // sum of its quantized stage contributions (absent stage = 0), so
    // no row can come from outside the two lists
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
    val sem = VectorOps.cosineRanked(spark, sfDir, 20).collect()
      .map(r => key(r) -> (1000000000L / (60 + r.getAs[Long]("rk")))).toMap
    val lex = TextOps.moreLikeThis(graft.sources.Tables.documents(spark, sfDir))
      .collect()
      .map(r => key(r) -> (1000000000L / (60 + r.getAs[Long]("rk")))).toMap
    rows.foreach { r =>
      val expect = sem.getOrElse(key(r), 0L) + lex.getOrElse(key(r), 0L)
      assert(expect > 0L, s"${key(r)} appears in neither stage list")
      assert(r.getAs[Long]("rrf_u") == expect,
        s"${key(r)}: rrf_u ${r.getAs[Long]("rrf_u")} != stage sum $expect")
    }
  }

  test("moreLikeThis: query's own doc never returned, scores are exact micro-unit sums") {
    val rows = TextOps.moreLikeThis(
      graft.sources.Tables.documents(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_id") >= 10L,
        "corpus side must exclude the query docs")
      assert(r.getAs[Long]("lex_u") > 0L)
    }
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { g =>
      assert(g.length <= 20)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val u = sorted.map(_.getAs[Long]("lex_u"))
      assert(u.zip(u.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q148: truncated-space top-5 with an honest full-dim instrument") {
    val rows = VectorOps.q148MrlTopk(spark, sfDir).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("rk"))
        .sameElements(1L to 5L))
    }
    // instrument honesty: full_rk restates q38's full-dim exact top-5
    // rank for exactly the overlapping (q, c) pairs
    val exact = VectorOps.q38EmbedTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) ->
        r.getAs[Long]("rk")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      val fi = r.fieldIndex("full_rk")
      if (r.isNullAt(fi)) assert(!exact.contains(k),
        s"$k missing full_rk but IS in the exact top-5")
      else assert(exact.get(k).contains(r.getLong(fi)),
        s"$k full_rk ${r.getLong(fi)} != exact ${exact.get(k)}")
    }
    // at dims = full width the truncation is the identity: top-5 sets
    // and ranks must equal the exact baseline's
    val full = VectorOps.q148MrlTopk(spark, sfDir, dims = 64).collect()
    assert(full.forall(r => !r.isNullAt(r.fieldIndex("full_rk")) &&
      r.getAs[Long]("rk") == r.getAs[Long]("full_rk")),
      "64-dim truncation must reproduce the exact ranking")
    // the deployable form (instrument = false, benched as q148prod)
    // changes no ranking, only drops the instrument column — compare
    // against the already-collected instrumented rows, not a recompute
    val prod = VectorOps.q148MrlTopk(spark, sfDir, instrument = false)
    assert(prod.columns.toSeq == Seq("q_id", "c_id", "cos_t", "rk"))
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("q_id"),
      r.getAs[Long]("c_id"), r.getAs[Double]("cos_t"), r.getAs[Long]("rk"))
    assert(prod.collect().map(key).sorted.sameElements(rows.map(key).sorted),
      "uninstrumented form diverged from the registered ranking")
  }

  test("q149: Hamming shortlist + exact rerank; packed XOR+POPCNT kernel matches per-dim Hamming") {
    val rows = VectorOps.q149BinaryTopk(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0L && h <= 64L, s"hamming $h out of [0,64]")
    }
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("rk"))
        .sameElements(1L to 5L))
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    // the production kernel: bit_count(sig XOR sig) ≡ the per-dim
    // sign-disagreement count, for every (query, corpus) pair
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val sigs = emb.select(col("vec_id"),
      VectorOps.binarySig(col("embedding")).as("sig"))
    val q = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"))
    val c = sigs.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("sig").as("c_sig"))
    val packed = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"),
        VectorOps.sigHamming(col("q_sig"), col("c_sig")).as("h"))
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("h"))
      .toMap
    val ev = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val qs = ev.keys.filter(_ < 10)
    val cs2 = ev.keys.filter(_ >= 10)
    for (qi <- qs; ci <- cs2) {
      val perDim = ev(qi).zip(ev(ci)).count { case (a, b) => (a > 0) != (b > 0) }
      assert(packed((qi, ci)) == perDim.toLong,
        s"packed kernel diverges at ($qi,$ci): ${packed((qi, ci))} vs $perDim")
    }
    // the end-to-end serving path (packed = true, benched as q149prod)
    // is output-identical to the registered per-dim form
    val prod = VectorOps.q149BinaryTopk(spark, sfDir, packed = true)
      .collect().map(_.toString).sorted
    assert(prod.sameElements(rows.map(_.toString).sorted),
      "packed serving path diverged from the registered form")
  }

  test("q150: ANN-quality card — counts recomputed from the tier instruments") {
    val card = VectorOps.q150AnnQualityCard(spark, sfDir)
    val rows = card.collect().map(r => r.getAs[String]("tier") -> r).toMap
    assert(rows.keySet == Set("mrl32", "binary"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 10L)
      val hits = r.getAs[Long]("hits5")
      assert(hits >= 0L && hits <= 50L)
      assert(r.getAs[Long]("recall5_m") == hits * 1000L / 50L,
        "recall per-mille must be exactly hits*1000 div (n_queries*5)")
      val mrr = r.getAs[Long]("mrr_u")
      assert(mrr >= 0L && mrr <= 10000000L, s"mrr_u $mrr out of range")
    }
    // the mrl32 row's hits5 is definitionally q148's full_rk instrument:
    // count of truncated-top-5 rows that exist in the full-dim top-5
    val mrlHits = VectorOps.q148MrlTopk(spark, sfDir).collect()
      .count(r => !r.isNullAt(r.fieldIndex("full_rk")))
    assert(rows("mrl32").getAs[Long]("hits5") == mrlHits.toLong,
      "card hits5 diverged from q148's own instrument")
    // r19: the card GATES — at the default floors both tiers state TRUE
    // (the oracle restates the literal, so a decay hash-fails the round)
    rows.values.foreach(r => assert(r.getAs[Boolean]("floor_ok"),
      s"${r.getAs[String]("tier")}: default floor must hold on this corpus"))
    graft.CacheHygiene.releaseTree(card)
  }

  test("q150 floors: an unreachable floor flips floor_ok, a floor-less tier is loud") {
    val strict = VectorOps.annQualityCard(spark, sfDir, floors = Map(
      "mrl32" -> ((999L, 9999999L)), "binary" -> ((150L, 500000L)))).collect()
      .map(r => r.getAs[String]("tier") -> r.getAs[Boolean]("floor_ok")).toMap
    assert(!strict("mrl32"),
      "an unreachable floor must read FALSE, not vanish into a report")
    assert(strict("binary"), "the untouched tier keeps its default verdict")
    val e = intercept[RuntimeException](
      VectorOps.annQualityCard(spark, sfDir, floors = Map(
        "mrl32" -> ((100L, 1000000L)))))
    assert(e.getMessage.contains("no floor"),
      s"a tier without a stated floor must refuse to ship: ${e.getMessage}")
  }

  test("q147/q149 plans: broadcast stages, every window keyed by q_id") {
    // q147's lexical stage legitimately reduces TWO corpus scalars
    // (doc count, mean length) through a 1-row SinglePartition exchange
    // — that is a broadcastable constant, not a data funnel — so the
    // global-window check targets Window operators specifically: each
    // must partition by q_id (or doc_id for the query-bag selection),
    // never globally.
    for (df <- Seq(VectorOps.q147RrfFusion(spark, sfDir),
        VectorOps.q149BinaryTopk(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange"),
        s"query/shortlist sides must broadcast:\n$plan")
      val windows = plan.split("\n").filter(_.contains("Window ["))
      assert(windows.nonEmpty)
      windows.foreach(w => assert(
        w.contains(", [q_id") || w.contains(", [doc_id"),
        s"window not keyed (global sort funnel):\n$w"))
      assert(df.count() > 0)
    }
  }

  test("pqTopk plan: exact-rank instrument broadcasts onto the ADC ranking, no global window") {
    // the scored frame is checkpointed inside pqTopk (the q107
    // shared-frame discipline), so the returned plan covers the two
    // rankings over it: both are bounded-heap TopKPerKey + a keyed
    // window over the already-reduced top set — never SinglePartition —
    // and the tiny exact-rank side joins in as a broadcast.
    val res = VectorOps.q130PqTopk(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"exact-rank side must broadcast:\n$plan")
    assert(!plan.contains("SinglePartition"), "no global window allowed")
    assert(res.count() > 0)
    graft.CacheHygiene.releaseTree(res)
  }
}
