package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B wall-clock probe for the r21 LM restructure: the two
  * candidate shapes run ALTERNATELY in one JVM (A B A B ...), so rig
  * contamination hits both alike and the min-per-shape comparison is
  * meaningful on a co-tenanted box. Shapes are reconstructed inline.
  * Usage: Test/runMain graft.tools.R21Ab unigram [rounds]
  */
object R21Ab {
  def main(args: Array[String]): Unit = {
    val what = if (args.nonEmpty) args(0) else "unigram"
    val rounds = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r21-ab")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps.tokens

    def docs = graft.sources.Tables.documents(spark, sfDir)
    def toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)

    // OLD q91 shape: independent vocab-keyed agg (second explode)
    def uniOld(): DataFrame = {
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
        .join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }
    // NEW q91 shape: vocab derived from the doc-keyed count
    def uniNew(): DataFrame = {
      val dc = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      val vocab = dc.groupBy("w").agg(sum("n").as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      dc.join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }
    // NEW+checkpoint variant: doc-keyed count materialized once
    def uniCkpt(): DataFrame = {
      val dc = graft.CacheHygiene.materialize(
        toks.groupBy("doc_id", "w").agg(count(lit(1)).as("n")), "ab dc")
      val vocab = dc.groupBy("w").agg(sum("n").as("nw"))
      val total = vocab.agg(sum("nw").cast("double").as("N"))
      val probs = vocab.crossJoin(broadcast(total))
        .select(col("w"), (log(col("nw").cast("double")) - log(col("N"))).as("lnp"))
      dc.join(probs, "w")
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          round(-sum(col("n").cast("double") * col("lnp")) / sum("n"), 4).as("nll"))
    }

    // ngramJaccard pair-stage shapes (q35/q94's mining): the checkpointed
    // distinct shingle index self-joined on (s, lang) — auto (estimate
    // picks broadcast at sf0.1) vs an explicit shuffled-hash / sort-merge
    // whose exchange both sides REUSE (the same LogicalRDD leaf).
    def pairStage(hintName: Option[String]): DataFrame = {
      val raw = docs.select(col("doc_id"), col("lang"),
        explode(graft.plans.GraftFunctions.shingles(tokens(col("text")), 3)).as("s"))
      val ex = graft.CacheHygiene.materialize(raw.distinct(), "ab shingle index")
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val right = hintName.map(ex.hint(_)).getOrElse(ex)
      val inter = ex.as("a")
        .join(right.as("b"),
          col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") /
        (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")
      inter
        .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select(col("a_id"), col("b_id"), round(jac, 4).as("jaccard"))
    }

    // q35 mining with the pair join keyed on a precomputed xxhash64 of the
    // shingle (8-byte hash-table probes) and the exact string demoted to a
    // residual equality — result-identical (the residual kills collisions)
    def pairStageHashKey(): DataFrame = {
      val raw = docs.select(col("doc_id"), col("lang"),
        explode(graft.plans.GraftFunctions.shingles(tokens(col("text")), 3)).as("s"))
      val ex = graft.CacheHygiene.materialize(
        raw.distinct().withColumn("sh", xxhash64(col("s"))), "ab shingle index hk")
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = ex.as("a")
        .join(ex.hint("shuffle_hash").as("b"),
          col("a.sh") === col("b.sh") && col("a.lang") === col("b.lang") &&
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") /
        (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")
      inter
        .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select(col("a_id"), col("b_id"), round(jac, 4).as("jaccard"))
    }

    // q120-shape labels consumption: the one-arg wrapper's labels frame is
    // read twice (sizes agg + join back) — lazy (docs⋈cc join runs twice)
    // vs materialized once (one more blocking job, then block reads).
    def labelsLazy(): DataFrame =
      graft.operators.TextOps.dupWeightsOn(
        graft.operators.TextOps.dedupComponentsOn(docs))
    def labelsCkpt(): DataFrame = {
      val l = graft.CacheHygiene.materialize(
        graft.operators.TextOps.dedupComponentsOn(docs), "ab labels")
      graft.operators.TextOps.dupWeightsOn(l)
    }
    // q134-shape: same question under the heavier card tail
    def cardLazy(): DataFrame =
      graft.operators.TextOps.memorizationCardOn(
        graft.operators.TextOps.dedupComponentsOn(docs), docs)
    def cardCkpt(): DataFrame = {
      val l = graft.CacheHygiene.materialize(
        graft.operators.TextOps.dedupComponentsOn(docs), "ab labels")
      graft.operators.TextOps.memorizationCardOn(l, docs)
    }

    // q36-shape capped pair listing with the narrow self-join optionally
    // hinted shuffled-hash (the widthCappedPairs internals, inlined)
    def capPairs(hintName: Option[String]): DataFrame = {
      val bucketed = graft.operators.VectorOps.bandedSignaturesPortable(docs)
      val based = graft.CacheHygiene.materialize(bucketed, "ab buckets")
      val stats = based.groupBy("band", "sig")
        .agg(count(lit(1)).as("w"), min(struct(col("doc_id"))).as("m"))
      val keyed = based.join(stats, Seq("band", "sig"))
      val narrow = keyed.filter(col("w") <= graft.operators.VectorOps.MaxBucketWidth)
        .drop("w", "m")
      val right = hintName.map(narrow.hint(_)).getOrElse(narrow)
      val narrowPairs = narrow.as("a").join(right.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      val starPairs = keyed
        .filter(col("w") > graft.operators.VectorOps.MaxBucketWidth &&
          col("doc_id") =!= col("m.doc_id"))
        .select(col("m.doc_id").as("a_id"), col("doc_id").as("b_id"))
      narrowPairs.union(starPairs)
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared_bands"))
    }

    // moreLikeThis/q145 scored-frame lineage: tf materialized (new) vs
    // not (old — dl/dfc/stats/score each re-run the tokenize). Both
    // variants end in an eager materialize of the scored frame, so the
    // timed cost IS the lineage execution; the consuming count is trivial.
    def scoredLineage(ckptTf: Boolean): DataFrame = {
      val tf0 = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      val tf = if (ckptTf) graft.CacheHygiene.materialize(tf0, "ab tf") else tf0
      val dl = tf.groupBy("doc_id").agg(sum("n").as("len"))
      val stats = dl.agg(count(lit(1)).as("nd"), avg("len").as("avgl"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log((col("nd").cast("double") - col("df") + 0.5) /
        (col("df") + 0.5) + 1.0)
      val norm = lit(1.2) * (lit(1 - 0.75) + lit(0.75) * col("len").cast("double") / col("avgl"))
      val scored = tf.join(dl, "doc_id").join(dfc, "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"),
          round(idf * (col("n") * lit(2.2)) / (col("n") + norm) * lit(1e6), 0)
            .cast("long").as("score_u"))
      val out = graft.CacheHygiene.materialize(scored, "ab scored")
      if (ckptTf) graft.CacheHygiene.release(tf)
      out
    }

    // q127's fingerprint-index pair self-join, auto vs shuffled-hash
    def winnowShape(hintName: Option[String]): DataFrame = {
      val fps = graft.CacheHygiene.materialize(
        graft.operators.TextOps.winnowFingerprints(docs), "ab winnow fps")
      val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      val a = fps.select(col("doc_id").as("a_id"), col("fp").as("a_fp"),
        xxhash64(col("fp")).as("fph"))
      val b0 = fps.select(col("doc_id").as("b_id"), col("fp").as("b_fp"),
        xxhash64(col("fp")).as("fph"))
      val b = hintName.map(b0.hint(_)).getOrElse(b0)
      a.join(b, Seq("fph")).filter(col("a_fp") === col("b_fp") &&
          col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2L)
        .join(sizes.select(col("doc_id").as("a_id"), col("nf").as("__na")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("nf").as("__nb")), "b_id")
        .select(col("a_id"), col("b_id"), col("n_shared"),
          round(col("n_shared").cast("double")
            / (col("__na") + col("__nb") - col("n_shared")), 4).as("resemblance"))
    }

    // q100's pair-count source: full d+1-gram strings parsed back into
    // (first, last) vs direct skip-gram pairs from two slices zipped
    def collocPairs(zip: Boolean): DataFrame = {
      val wl = tokens(col("text"))
      val pairs0 =
        if (!zip) {
          val gramArrays = (2 to 5).map(n =>
            graft.plans.GraftFunctions.shingles(wl, n))
          docs.select(explode(concat(gramArrays: _*)).as("g"))
            .select(substring_index(col("g"), " ", 1).as("x"),
              substring_index(col("g"), " ", -1).as("y"))
        } else {
          val pairArrays = (1 to 4).map { d =>
            arrays_zip(
              slice(wl, lit(1), greatest(size(wl) - d, lit(0))),
              slice(wl, lit(1 + d), greatest(size(wl) - d, lit(0))))
          }
          docs.select(explode(concat(pairArrays: _*)).as("p"))
            .select(col("p")("0").as("x"), col("p")("1").as("y"))
        }
      pairs0.filter(length(col("x")) > 0 && length(col("y")) > 0)
        .select(least(col("x"), col("y")).as("wa"),
          greatest(col("x"), col("y")).as("wb"))
        .groupBy("wa", "wb").agg(count(lit(1)).as("cab"))
    }

    // q86's one-shot bloom gate: corpus fingerprints computed per consumer
    // (sizing count + filter build + verify semi-join = three text scans,
    // the OLD shape, inlined) vs materialized once (the changed bloomGate)
    def bloomShape(ckpt: Boolean): DataFrame = {
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      if (ckpt)
        graft.operators.TextOps.bloomGate(corpus, batch)
          .select(col("doc_id"), col("fp"))
      else {
        val fpr = graft.operators.TextOps.fingerprint(col("text"))
        val corpusFp = corpus.select(fpr.as("fp"))
        val n = math.max(corpusFp.count(), 1L)
        val bc = spark.sparkContext.broadcast(
          graft.operators.BloomDedupGate.buildFilter(corpusFp, n, 0.01))
        val batchFp = batch.select(col("doc_id"), fpr.as("fp"))
        val maybe = graft.plans.BloomMightContain.might(col("fp"), bc)
        val fresh = batchFp.filter(coalesce(!maybe, lit(true)))
        val suspects = batchFp.filter(coalesce(maybe, lit(false)))
        val suspectFps = suspects.select(col("fp")).distinct()
        val hits = corpusFp
          .join(broadcast(suspectFps), Seq("fp"), "left_semi").distinct()
        fresh.unionByName(
          suspects.join(broadcast(hits), Seq("fp"), "left_anti"))
          .select(col("doc_id"), col("fp"))
      }
    }

    val shapes: Seq[(String, () => DataFrame)] = what match {
      case "unigram" => Seq("old" -> (() => uniOld()), "new" -> (() => uniNew()),
        "ckpt" -> (() => uniCkpt()))
      case "pairjoin" => Seq(
        "auto" -> (() => pairStage(None)),
        "shj" -> (() => pairStage(Some("shuffle_hash"))),
        "smj" -> (() => pairStage(Some("merge"))))
      case "labels" => Seq("lazy" -> (() => labelsLazy()),
        "ckpt" -> (() => labelsCkpt()))
      case "capjoin" => Seq(
        "auto" -> (() => capPairs(None)),
        "shj" -> (() => capPairs(Some("shuffle_hash"))))
      case "scored" => Seq(
        "old" -> (() => scoredLineage(ckptTf = false)),
        "new" -> (() => scoredLineage(ckptTf = true)))
      case "winnow" => Seq(
        "auto" -> (() => winnowShape(None)),
        "shj" -> (() => winnowShape(Some("shuffle_hash"))))
      case "colloc" => Seq(
        "gram" -> (() => collocPairs(zip = false)),
        "zip" -> (() => collocPairs(zip = true)))
      case "bloom" => Seq(
        "old" -> (() => bloomShape(ckpt = false)),
        "new" -> (() => bloomShape(ckpt = true)))
      case "hashkey" => Seq(
        "strkey" -> (() => pairStage(Some("shuffle_hash"))),
        "hkey" -> (() => pairStageHashKey()))
      case "card" => Seq("lazy" -> (() => cardLazy()),
        "ckpt" -> (() => cardCkpt()))
      case x => sys.error(s"unknown ab target $x")
    }
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // warm all shapes once
    shapes.foreach { case (_, mk) => mk().count(); clear() }
    val walls = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to rounds; (name, mk) <- shapes) {
      val t0 = System.nanoTime
      val n = mk().count()
      clear()
      walls(name) = ((System.nanoTime - t0) / 1e9) :: walls(name)
      assert(n > 0)
    }
    shapes.foreach { case (name, _) =>
      val ws = walls(name)
      println(f"AB $what/$name min=${ws.min}%.3f med=${ws.sorted.apply(ws.size / 2)}%.3f " +
        f"all=[${ws.reverse.map(w => f"$w%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
