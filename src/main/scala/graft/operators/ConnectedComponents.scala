package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star rounds (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — the dedup-clustering closure that scales:
  * near-dup pair lists (q35/q36/q58) become component labels in
  * O(log n) rounds regardless of component DIAMETER, where one-hop
  * min-label propagation ([[VectorOps.dedupClustersConverged]]'s shape)
  * needs O(diameter) rounds and a long chain of borderline pairs can
  * make diameter ~n.
  *
  * Each round is two keyed aggregations and two joins over the edge
  * list — neighborhoods are never collected into arrays (a hub node's
  * adjacency stays distributed across rows; hubs are exactly what the
  * algorithm converges toward). Every round's edge set is materialized
  * with truncated lineage — localCheckpoint by default, a RELIABLE
  * checkpoint under `spark.graft.reliableCheckpoints=true` (the r19
  * cluster-posture seam: an O(log n)-round closure over a 100-TB pair
  * list is exactly the multi-hour job where executor loss must cost a
  * partition re-read, not the whole closure) — and the previous round's
  * blocks are released (the [[graft.CacheHygiene]] contract).
  *
  * - large-star: every node u attaches its LARGER neighbors to
  *   m(u) = min(Γ(u) ∪ {u}).
  * - small-star: every node u (edges directed larger→smaller) attaches
  *   its smaller neighbors and itself to m(u).
  *
  * At the joint fixpoint the graph is a disjoint union of stars centered
  * at each component's minimum id — the label IS the star center.
  * Deterministic: min-based, partitioning-independent.
  */
object ConnectedComponents {

  /** Component labels for every id appearing in `edges` (cols src, dst;
    * self-loops and duplicate edges tolerated): (id, component) with
    * component = min id reachable. Throws if `maxIter` rounds don't
    * converge — silent partial connectivity would dedup wrongly.
    *
    * CALLER CONTRACT: `edges` must be a DETERMINISTIC plan (no sampling,
    * no rand(), no first()-style order dependence). In local mode the
    * base materialization is a LAZY localCheckpoint, so a task retried
    * after partial persistence recomputes its partition from the
    * caller's plan — a nondeterministic edge source would silently make
    * persisted and recomputed partitions disagree. (Same contract on
    * [[runMembers]].)
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val (base, cur, _) = starFixpoint(edges, maxIter)
    val nodes = base.select(col("u").as("id"))
      .union(base.select(col("v").as("id"))).distinct()
    // fixpoint edges are stars (center = component min): members label to
    // the center, centers and isolated nodes label to themselves. The
    // final checkpoint (and `base`, via `nodes`) back the returned plan,
    // so they are NOT released here. They sit UNDER a join, where
    // near-root CacheHygiene.release cannot reach them by design —
    // callers that have materialized the result and own it exclusively
    // release them with [[graft.CacheHygiene.releaseTree]] (Verify does
    // exactly that per query; Bench's between-timing blanket unpersist
    // subsumes it — so repeated q94/q96/q99/q100 runs in one session
    // don't accumulate immortal checkpoint blocks).
    nodes.join(cur.select(col("v").as("id"), col("u").as("component")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Member→center labels ONLY: ids that are members of a non-trivial
    * component, labeled with their component min; centers and isolated
    * ids are ABSENT (at the star fixpoint each appears only as a center
    * or not at all — a left-join + coalesce against the caller's own id
    * universe labels them to themselves, exactly [[run]]'s semantics).
    * For consumers that ALREADY hold the id universe (q94's docs frame)
    * this skips [[run]]'s node-universe union+distinct+left-join — one
    * exchange and a join side per closure query (r21). Caller contract:
    * `edges` must be a deterministic plan — see [[run]].
    */
  private[operators] def runMembers(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val (base, cur, curOwned) = starFixpoint(edges, maxIter)
    // Unlike [[run]] (whose returned plan reads base via `nodes`), the
    // member-only result reads ONLY the fixpoint frame — when the loop
    // ran at least one round, `cur` is its own checkpoint and base is
    // dead weight; releasing it here keeps long sessions from
    // accumulating one edge-set-sized block set per closure (r21). At
    // zero rounds `cur` is still a filter VIEW over base, which must
    // stay.
    if (curOwned) graft.CacheHygiene.release(base)
    cur.select(col("v").as("id"), col("u").as("component"))
  }

  /** The alternating-star fixpoint loop shared by [[run]] and
    * [[runMembers]]: returns (base checkpoint, fixpoint star edges,
    * whether the fixpoint frame is its OWN checkpoint — false means it
    * is still the round-0 filter view over base). Nothing is released
    * here — base backs run()'s returned plan, and runMembers releases
    * it only when the fixpoint frame no longer reads it.
    */
  private def starFixpoint(edges: DataFrame, maxIter: Int): (DataFrame, DataFrame, Boolean) = {
    val spark = edges.sparkSession
    val reliable =
      spark.conf.get(graft.CacheHygiene.ReliableFlag, "false").toBoolean
    // ONE execution of the caller's edge plan (for q94 that plan is the
    // whole near-dup pair mining) — nodes and the working edge set both
    // derive from this checkpoint. It backs the returned plan via
    // `nodes`, so it is never released here. Local mode uses the LAZY
    // localCheckpoint (r21, the same fusion the round frames got): the
    // round-0 stats job below is the single first-touch action, so it
    // computes, persists and lineage-truncates the mining in ONE job
    // where the eager form paid a materialize job plus a convergence
    // job. Deterministic under retry (keyed distinct over the caller's
    // deterministic plan); reliable mode keeps the eager checkpoint (a
    // lazy reliable checkpoint recomputes the frame to write it).
    val basePlan = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val base =
      if (reliable)
        graft.CacheHygiene.materialize(basePlan, "connectedComponents base")
      else basePlan.localCheckpoint(eager = false)
    // Round-0 working set: a plain filter VIEW over the base checkpoint —
    // its own checkpoint bought nothing (the filter re-reads base's
    // blocks) and cost one more driver-blocking job per closure (r21).
    // `curOwned` guards release: releasing the round-0 view would
    // unpersist base itself (CacheHygiene.release unwraps Filter).
    var cur = base.filter(col("u") =!= col("v"))
    var curOwned = false

    // (edge count, is-star-set) in ONE job (r22, replacing the r21
    // (count, hash-sum) fingerprint + converging-round exceptAll): a
    // canonical (u < v, distinct) edge set is a disjoint union of
    // min-rooted stars — i.e. THE fixpoint both star ops leave unchanged
    // — exactly when no node appears on both the center (u) and member
    // (v) side and no member appears twice. That is an EXACT convergence
    // test over a single frame: the 2^-64 hash-collision caveat and the
    // exact exceptAll confirmation job are both gone, and the loop stops
    // the moment a round's OUTPUT is the fixpoint instead of one round
    // later when the next output comes back equal — one fewer star-op
    // round per closure plus the confirmation job.
    //   Why the test is sufficient: if it holds, edges group by center c
    // into stars that share no nodes (members are unique, centers never
    // appear as members), so the set's components ARE those stars, each
    // centered at its minimum (u < v per edge). largeStar maps every
    // member straight to its center (m(member) = c, no larger neighbor
    // pairs survive canonicalization) and smallStar regroups the same
    // edges — both identities. Necessity: the algorithm's fixpoints are
    // exactly the min-rooted disjoint star sets (Kiveris et al. §3), so
    // the old equality test cannot stop before this one.
    //   Shape: one explode (NOT a self-union — a single scan is the lazy
    // checkpoint's sole first-toucher) into a map-side-combinable
    // node-keyed agg, then a scalar fold. The node agg adds one narrow
    // exchange per round; the saved confirming round removes two keyed
    // aggs, two joins and a checkpoint over the same volume.
    def roundStats(e: DataFrame): (Long, Boolean) = {
      val r = e.select(explode(array(
          struct(col("u").as("node"), lit(1L).as("cu"), lit(0L).as("cv")),
          struct(col("v").as("node"), lit(0L).as("cu"), lit(1L).as("cv"))))
          .as("x"))
        .groupBy(col("x.node"))
        .agg(sum(col("x.cu")).as("nu"), sum(col("x.cv")).as("nv"))
        .agg(coalesce(sum("nv"), lit(0L)).as("edges"),
          coalesce(max(when(col("nu") > 0 && col("nv") > 0, 1)
            .otherwise(0)), lit(0)).as("mixed"),
          coalesce(max("nv"), lit(0L)).as("maxv"))
        .collect()(0)
      val edges = r.getLong(0)
      (edges, edges == 0L || (r.getInt(1) == 0 && r.getLong(2) <= 1L))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
      val m = sym.groupBy("a").agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("mb"), col("a")).as("m"))
      // edge (m(a), b) for every neighbor b > a; m(a) <= a < b keeps the
      // pair canonical without re-ordering
      sym.join(m, "a").filter(col("b") > col("a"))
        .select(col("m").as("u"), col("b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // edges already canonical (u < v): v is the larger endpoint, so
      // Γ⁻(v) = its u's
      val m = e.groupBy("v").agg(min(col("u")).as("m"))
      val withM = e.join(m, "v")
      withM.select(col("m").as("u"), col("u").as("v"))
        .union(withM.select(col("m").as("u"), col("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // round-0 stats answer emptiness AND star-ness in the same job that
    // first-touches (materializes) the lazy base checkpoint — a pair
    // mining whose output is already disjoint stars (every 2-clique
    // corpus, and any closure re-run over labeled output) closes here
    // with ZERO star rounds
    val stats0 = roundStats(cur)
    val roundEdges = scala.collection.mutable.ArrayBuffer[Long](stats0._1)
    var converged = stats0._2
    var iter = 0
    while (!converged && iter < maxIter) {
      // Local mode: LAZY localCheckpoint, so the stats aggregation below
      // is the job that computes, persists AND lineage-truncates the
      // round — one job per round instead of two (r21). Determinism
      // under task retry holds: the star ops are deterministic keyed
      // aggs/joins over a checkpointed input (no sampling, no rand), so
      // a recomputed partition is bit-identical to the persisted one.
      // Reliable mode keeps the EAGER checkpoint: a lazy reliable
      // checkpoint recomputes the frame a second time to write it,
      // which is the wrong trade on the cluster path the flag serves.
      val next =
        if (reliable)
          graft.CacheHygiene.materialize(
            smallStar(largeStar(cur)), "connectedComponents round edges")
        else smallStar(largeStar(cur)).localCheckpoint(eager = false)
      val (n, star) = roundStats(next)
      converged = star
      if (curOwned) graft.CacheHygiene.release(cur)
      cur = next
      curOwned = true
      roundEdges += n
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no convergence after $maxIter rounds " +
          s"(${roundEdges.last} edges) — raise maxIter; a partial closure would " +
          "mislabel components silently")
    lastRounds = iter
    lastRoundEdges = roundEdges.toList
    (base, cur, curOwned)
  }

  /** [[run]] plus the round count — spec hook for the O(log n) claim. */
  private[graft] var lastRounds: Int = -1

  /** Edge-set size entering each round (index 0 = the initial canonical
    * edge set) — the per-round shuffle-volume proxy the topology probe
    * records: every round shuffles ~2× its edge count through the star
    * aggregations, so a topology that made rounds grow OR kept edge
    * volume from contracting would show here. */
  private[graft] var lastRoundEdges: Seq[Long] = Nil
}
