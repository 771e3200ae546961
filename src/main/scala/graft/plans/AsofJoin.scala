package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a FIRST-CLASS physical operator — the
  * (c) tier of the extension ladder (custom LogicalPlan + Strategy +
  * SparkPlan via SparkSessionExtensions): for every left row, attach
  * the right row with the same key and the greatest rightTs <= leftTs
  * (left outer: no match → nulls).
  *
  * Why a custom exec: the composable formulations pay real overhead —
  * the union+window idiom (queries/Temporal.joinAsof) materializes the
  * union and runs a window over BOTH sides' rows; an inequality join
  * is a BroadcastNestedLoopJoin (quadratic). This operator declares
  * SMJ-shaped requirements — ClusteredDistribution on the key and
  * (key, ts) child ordering, so EnsureRequirements inserts exactly the
  * exchanges+sorts a sort-merge join would get — and then matches in
  * ONE streaming merge pass per partition: O(|L| + |R|) time, O(1)
  * state (the current candidate row), no window buffer, no union.
  * At 100 TB this is the same cost envelope as a co-partitioned SMJ.
  *
  * Determinism contract: keys and timestamps are non-null primitives
  * (the row copied as the running candidate is bounded O(1) state);
  * among equal (key, ts) right rows the LAST in sort order wins for
  * backward, the FIRST for forward — the same tie classes as the
  * window forms' last()/first(). `forward = true` flips the direction:
  * EARLIEST right row with rightTs >= leftTs (next-event attribution)
  * — the same merge pass peeking the head instead of keeping a
  * running candidate.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsofJoinPlan → AsofJoinExec (injected by
  * [[graft.GraftExtensions]]).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SMJ-shaped requirements: co-partition on the key, sort by (key, ts).
  // EnsureRequirements supplies the exchanges + sorts (or elides them
  // when children are already partitioned/sorted — e.g. bucketed reads).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTs, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTs, rOut)
    val keyOrdering =
      TypeUtils.getInterpretedOrdering(leftKey.dataType).asInstanceOf[Ordering[Any]]
    val tsOrdering =
      TypeUtils.getInterpretedOrdering(leftTs.dataType).asInstanceOf[Ordering[Any]]
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { lRow =>
        val k = lkB.eval(lRow)
        val t = ltB.eval(lRow)
        var advance = true
        if (forward) {
          // discard right rows that can match neither this left row
          // (needs rts >= t) nor any later one (their ts only grows);
          // the surviving head is PEEKED, never consumed - it may also
          // be the match for the next left row.
          while (advance && rBuf.hasNext) {
            val hk = rkB.eval(rBuf.head)
            val cmp = keyOrdering.compare(hk, k)
            if (cmp < 0 ||
                (cmp == 0 && tsOrdering.compare(rtB.eval(rBuf.head), t) < 0)) {
              rBuf.next()
            } else advance = false
          }
          val m =
            if (rBuf.hasNext && keyOrdering.compare(rkB.eval(rBuf.head), k) == 0)
              rBuf.head
            else nullRight
          project(joiner(lRow, m))
        } else {
          while (advance && rBuf.hasNext) {
            val hk = rkB.eval(rBuf.head)
            val cmp = keyOrdering.compare(hk, k)
            if (cmp < 0) {
              rBuf.next() // stale key, discard
            } else if (cmp == 0 && tsOrdering.compare(rtB.eval(rBuf.head), t) <= 0) {
              matchRow = rBuf.next().copy() // O(1) running candidate
              matchKey = k
            } else advance = false
          }
          val m =
            if (matchRow != null && keyOrdering.compare(matchKey, k) == 0) matchRow
            else nullRight
          project(joiner(lRow, m))
        }
      }
    }
  }
}

object AsofJoin {
  import org.apache.spark.sql.GraftColumnBridge

  /** As-of join `left` to `right` on equal `key`, latest `rightTs` at
    * or before `leftTs`; left outer. Names resolve against the
    * respective side's analyzed output (session-conf resolver).
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      forward: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    val lPlan = GraftColumnBridge.logicalPlan(leftDf)
    val rPlan = GraftColumnBridge.logicalPlan(rightDf)
    def resolve(name: String, plan: LogicalPlan): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      resolve(leftKey, lPlan), resolve(rightKey, rPlan),
      resolve(leftTs, lPlan), resolve(rightTs, rPlan), forward))
  }
}
