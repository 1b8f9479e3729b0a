package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.operators.{Marts, TextOps, VectorOps}

/** Physical-plan assertions: the properties that decide whether these
  * operators survive a 100 TB scale-up — pushdown at the scan, broadcasts
  * for dim joins, no cartesian products in the similarity self-joins,
  * top-k as TakeOrderedAndProject rather than a global sort.
  */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString + "\n" +
      df.queryExecution.optimizedPlan.toString
  }

  test("q02: filter and projection reach the parquet scan") {
    val df = Marts.q02FilterProject(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity)"),
      s"missing pushed filters in:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double"),
      s"projection not pruned to 5 columns in:\n$scan")
  }

  test("q05: star join broadcasts the dimension side") {
    val df = Marts.q05RegionalRevenue(spark, sfDir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q10: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val df = Marts.q10TopkOrders(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not O(k):\n$plan")
  }

  test("similarity self-joins never plan a cartesian/nested-loop product") {
    Seq(
      TextOps.q35NgramJaccard(spark, sfDir),
      VectorOps.q36MinhashLsh(spark, sfDir),
      VectorOps.q37Simhash(spark, sfDir),
      VectorOps.q39EmbedLsh(spark, sfDir),
      VectorOps.q40EmbedNeardup(spark, sfDir),
      VectorOps.q58NeardupBlocked(spark, sfDir),
      graft.operators.RangeJoin.q62RangeJoin(spark, sfDir),
      graft.operators.RangeJoin.q64IntervalOverlap(spark, sfDir),
      TextOps.q65Decontaminate(spark, sfDir),
    ).foreach { df =>
      val plan = planString(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in:\n$plan")
    }
  }

  test("q38: query side broadcasts against the streamed corpus") {
    val df = VectorOps.q38EmbedTopk(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query set not broadcast in:\n$plan")
  }

  test("q59: column pruning reaches the documents scan") {
    val df = TextOps.q59HashSplit(spark, sfDir)
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, "expected a parquet scan in the plan")
    scans.foreach { scan =>
      assert(scan.contains("doc_id") && scan.contains("text") && !scan.contains("lang"),
        s"scan must read only doc_id+text: $scan")
    }
  }

  test("q68: stratified sampling plans as the bounded-heap operator, not a window sort") {
    val plan = planString(TextOps.q68StratifiedSample(spark, sfDir))
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in:\n$plan")
    assert(!plan.contains("Window"), s"low-cardinality stratum must not window-sort:\n$plan")
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val df = Marts.q01PricingSummary(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"no partial aggregation in:\n$plan")
  }

  test("q38: brute-force top-k plans as bounded heaps over the scored volume") {
    // executedPlan only: planString appends the optimized LOGICAL plan,
    // whose Window lines would sit below the physical heap line and trip
    // the ordering assertion
    val plan = VectorOps.q38EmbedTopk(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"scored n x q rows must reduce through the heap operator:\n$plan")
    // the only Window allowed is the rank materializer OVER the k-row
    // heap output - i.e. downstream of (printed above) the TopKPerKey
    // node; EVERY Window occurrence must satisfy it, and one must exist
    val lines = plan.linesIterator.toSeq
    val winIdxs = lines.zipWithIndex.collect { case (l, i) if l.contains("Window") => i }
    val heapIdx = lines.indexWhere(_.contains("TopKPerKey"))
    assert(winIdxs.nonEmpty && heapIdx >= 0, s"missing rank window or heap:\n$plan")
    assert(winIdxs.forall(_ < heapIdx),
      s"every window must consume the heap output, not the full volume:\n$plan")
  }

  test("ivfSearch: probe selection is kernel-projected - no crossJoin against centroids") {
    // q57IvfTopk returns an eager checkpoint (opaque LogicalRDD), so
    // assert on the search plan before materialization
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("norm", sqrt(VectorOps.dot(col("vec"), col("vec"))))
    val queries = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
    val corpus = all.filter(col("vec_id") >= 10)
    val (centroids, assignments) = VectorOps.ivfIndex(corpus)
    val plan = planString(
      VectorOps.ivfSearch(queries, corpus, centroids, assignments)).toLowerCase
    assert(plan.contains("topcentroids"),
      s"expected the per-row probe kernel in:\n$plan")
    assert(!plan.contains("cartesianproduct"),
      s"probe selection must not cartesian-join:\n$plan")
  }

  test("q92: the PSI histogram is ONE corpus scan (pivoted split, window totals)") {
    val plan = TextOps.q92QualityPsi(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1,
      s"the filter-split formulation scanned documents per branch; pivoted must scan once, got $scans:\n$plan")
  }

  test("q101/q103: scrubs read ONE materialized token frame; cover joins broadcast; no cartesian") {
    // the checkpointed token frame replaces every corpus re-read: the
    // whole scrub plan must contain ZERO parquet scans (all leaves are
    // the one ExistingRDD) — a FileScan here means a consumer escaped
    // the materialization and re-reads 100 TB
    for ((name, df) <- Seq(
        "q101" -> TextOps.q101SpanScrub(spark, sfDir),
        "q103" -> TextOps.q103TemplateScrub(spark, sfDir),
        "q140" -> TextOps.q140KeepfirstScrub(spark, sfDir))) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!plan.contains("FileScan"),
        s"$name must read only its checkpointed token frame:\n$plan")
      assert(!plan.toLowerCase.contains("cartesianproduct"), s"$name:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name's cover/rebuild joins must broadcast their bounded sides:\n$plan")
      // q140's first-occurrence pick must be the map-side-combinable
      // min(struct) AGGREGATE, never a row_number sort window — a viral
      // gram duplicated in millions of docs partial-aggregates on every
      // mapper instead of sort-shuffling one hot partition. Asserted on
      // the already-built plan: a second q140 build would re-checkpoint
      // the corpus and leak it past the releaseTree below.
      if (name == "q140")
        assert(!plan.contains("Window"),
          s"q140 keep-first must aggregate, not window:\n$plan")
      graft.CacheHygiene.releaseTree(df)
    }
  }

  test("sketch pair/cluster kernels measure buckets map-side: no Window (r17)") {
    // widthCappedPairs and onePassClusters annotate bucket width/min via
    // groupBy(key).agg(count, min(struct)) + a key join — never a Window.
    // A Window here buffers each bucket in ONE task: a viral band bucket
    // at 100 TB funnels through a single spilling task just to be
    // MEASURED before star-routing kicks in; the keyed agg is map-side
    // combinable. Only the (windowless) signature frame is checkpointed,
    // so the whole kernel is visible in the consumer plan and assertable.
    for ((name, df) <- Seq(
        "q36" -> VectorOps.q36MinhashLsh(spark, sfDir),
        "q37" -> VectorOps.q37Simhash(spark, sfDir),
        "q39" -> VectorOps.q39EmbedLsh(spark, sfDir),
        "q51" -> VectorOps.q51DedupClusters(spark, sfDir),
        "q51prod" -> VectorOps.q51Prod(spark, sfDir))) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!plan.contains("Window"),
        s"$name bucket width/min must aggregate, not window:\n$plan")
      assert(plan.contains("HashAggregate"),
        s"$name: expected the width/min aggregate in:\n$plan")
      graft.CacheHygiene.releaseTree(df)
    }
  }

  test("q102: the rank runs on the incidence-floored aggregate with group-limit pushdown") {
    val plan = TextOps.q102Templates(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    // Spark's WindowGroupLimit prunes per-source rows to k BEFORE the
    // final window — the optimizer-applied bounded top-k this shape
    // exists for; and the source-sizes side must broadcast
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank pushdown over the floored aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"\n$plan")
  }

  test("q93: the budget-cutoff window runs over the bin aggregate, never the corpus") {
    val plan = TextOps.q93TokenBudget(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    // every Window node in the plan must have a HashAggregate strictly
    // below it before any scan — i.e. its input is the ≤ groups×bins
    // aggregate, not document rows
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"expected a window in:\n$plan")
    val below = lines.drop(winIdx)
    val aggIdx = below.indexWhere(_.contains("HashAggregate"))
    val scanIdx = below.indexWhere(_.contains("FileScan"))
    assert(aggIdx >= 0 && scanIdx > aggIdx,
      s"window must sit above the bin aggregate (agg@$aggIdx scan@$scanIdx):\n$plan")
  }
}
