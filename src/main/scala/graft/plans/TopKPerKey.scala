package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key: for each key, retain the k best rows by
  * `order` — the grouped-top-k Spark can only express as a full window
  * sort + filter (sorting every group entirely to keep k rows).
  *
  * Planned as a two-phase aggregation shape:
  *
  *   partial (map-side) heaps → key-clustered exchange → final heaps
  *
  * The partial phase runs on the child's partitions and forwards at most
  * `keys-per-partition × k` rows into the shuffle — the same
  * map-side-combine trick partial aggregation uses, so shuffle volume is
  * bounded by key cardinality, not input size. The final phase merges the
  * per-partition survivor sets, which is exact: a row in the true global
  * top-k of its key is in that key's top-k of its own partition.
  *
  * Memory contract: each phase keeps O(keys-in-partition × k) rows on
  * heap and does not spill — the operator targets bounded key
  * cardinality per partition (segments, categories, tenants). For
  * pathological key counts where keys × k approaches partition row
  * counts, the window-sort formulation (which spills) is the right plan;
  * the partial phase also degrades gracefully there (it forwards at most
  * its input, never more).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: SortOrder, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: SortOrder, k: Int,
    child: SparkPlan, partial: Boolean) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  /** The final phase needs all rows of a key co-located; the partial
    * phase runs wherever the child's rows already are (no exchange below
    * it — the planner inserts the shuffle between partial and final).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rowOrd: compare < 0 means "earlier in sort output" = better
      val rowOrd = new LazilyGeneratedOrdering(Seq(sortOrder), childOutput)
      // heap keeps the WORST retained row on top for O(log k) eviction
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, rowOrd.reversed())
          heaps.put(key, heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h => h.forEach(r => out += r) }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}
