package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Global running sums over a range-partitioned sort, as a whole
  * physical operator — the engine under
  * [[graft.core.ScalableRank]]'s total-order primitives (rank =
  * running sum of 1). Appends, for each value expression, its global
  * inclusive running sum in the child's partition-then-row order.
  *
  * Why a custom exec (the (c) tier of the extension ladder, the
  * AsofJoin precedent): the two-pass form needs the per-partition
  * value totals BEFORE the output pass, and both passes MUST observe
  * the same range boundaries. The r13 formulation (RDD.zipWithIndex
  * shape) pinned the boundaries by sharing one RDD but paid a
  * Row-object round-trip on the corpus — deserialization, codegen
  * break, eager construction. A pure-relational formulation (two
  * DataFrame references to the sorted frame + ReuseExchange) keeps
  * codegen but its correctness hangs on exchange reuse, which column
  * pruning silently breaks: the offsets branch prunes the scan to the
  * sort keys, the subtrees stop canonicalizing equal, and each branch
  * samples its own boundaries — wrong offsets, no error. This
  * operator gets both guarantees structurally: `child.execute()` is
  * called ONCE, so the shuffle dependency (and its sampled
  * boundaries) is shared by the offsets job and the output pass by
  * construction, and rows stay `UnsafeRow`s end to end (a JoinedRow +
  * UnsafeProjection appends the sum columns; downstream stages resume
  * whole-stage codegen above this node).
  *
  * Scale shape: one extra job whose output is |partitions| × |values|
  * longs (the per-partition subtotals — the only driver-side state),
  * then a map-side output pass. The shuffle files are written once
  * and read by both jobs; the in-partition sort re-runs in each
  * (2× sort of parallel slices — the price of not persisting the
  * corpus-sized sorted frame in executor storage).
  *
  * Contract: `values` must be deterministic LongType expressions over
  * the child's output (ScalableRank casts/validates); nulls add 0.
  * The child must already be range-partitioned + in-partition sorted
  * under a TOTAL order (ScalableRank composes
  * `repartitionByRange(parts) + sortWithinPartitions` directly
  * below, with explicit `parts` so AQE never coalesces the
  * exchange); a task retry re-reads the same shuffle partition in
  * the same order, so the sums are retry-safe.
  */
case class GlobalRunningSumPlan(
    child: LogicalPlan,
    values: Seq[Expression],
    outAttrs: Seq[Attribute]) extends UnaryNode {

  override def output: Seq[Attribute] = child.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRunningSumPlan =
    copy(child = newChild)
}

/** Planner strategy: GlobalRunningSumPlan → GlobalRunningSumExec
  * (injected by [[graft.GraftExtensions]]).
  */
object GlobalRunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRunningSumPlan(child, values, outAttrs) =>
      GlobalRunningSumExec(planLater(child), values, outAttrs) :: Nil
    case _ => Nil
  }
}

case class GlobalRunningSumExec(
    child: SparkPlan,
    values: Seq[Expression],
    outAttrs: Seq[Attribute]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ outAttrs

  // passthrough: rows keep their partition and order, columns append
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  /** The child minus its top in-partition sort, when that shape is
    * recognizable: the subtotal job is order-FREE, so it can read the
    * exchange output directly and skip one full sort of the data.
    * Sound because both RDDs hang off the SAME exchange exec node,
    * whose shuffle dependency (partitioner, sampled boundaries,
    * shuffle files) is a per-instance lazy val — partition contents
    * are identical, only the in-partition order differs.
    */
  private def sansSort(p: SparkPlan): Option[SparkPlan] = p match {
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      sansSort(w.child)
    case s: org.apache.spark.sql.execution.SortExec if !s.global =>
      Some(s.child match {
        case i: org.apache.spark.sql.execution.InputAdapter => i.child
        case c => c
      })
    case _ => None
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val childRDD = child.execute() // ONCE — the subtotal job and the
    // output pass share the shuffle dependency, hence the sampled
    // range boundaries
    val bound = BindReferences.bindReferences(values, child.output)
    val k = bound.length
    val nParts = childRDD.getNumPartitions
    // job 1: per-partition value totals (order-free; |parts|·k longs
    // of driver state). Skipped outright for a single partition, and
    // run WITHOUT the in-partition sort when the child shape allows.
    val partSums: Array[Array[Long]] =
      if (nParts <= 1) Array.fill(nParts)(new Array[Long](k))
      else {
        val sumRDD = sansSort(child).map(_.execute()).getOrElse(childRDD)
        sumRDD.mapPartitions { it =>
          val proj = UnsafeProjection.create(bound)
          val acc = new Array[Long](k)
          it.foreach { row =>
            val v = proj(row)
            var j = 0
            while (j < k) { if (!v.isNullAt(j)) acc(j) += v.getLong(j); j += 1 }
          }
          Iterator.single(acc)
        }.collect()
      }
    val offsets = partSums.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => a(j) + b(j))
    }
    // output pass: map-side running sums from the partition's offset
    val childOutput = child.output
    val outputAttrs = output
    childRDD.mapPartitionsWithIndex({ (pi, it) =>
      val acc = offsets(pi).clone()
      val proj = UnsafeProjection.create(bound)
      val outProj = UnsafeProjection.create(outputAttrs, childOutput ++ outAttrs)
      val extra = new GenericInternalRow(k)
      val joined = new JoinedRow
      it.map { row =>
        val v = proj(row)
        var j = 0
        while (j < k) {
          if (!v.isNullAt(j)) acc(j) += v.getLong(j)
          extra.update(j, acc(j))
          j += 1
        }
        outProj(joined(row, extra))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRunningSumExec =
    copy(child = newChild)
}
