package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

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
  * Type/null contract (enforced at plan build, not by comment): key
  * and ts expressions must be ATOMIC types (the interpreted orderings
  * and the O(1) cached-candidate state are only sound there; cached
  * key/ts values are defensively copied via InternalRow.copyValue so
  * a UTF8String pointing into a reused batch page cannot mutate under
  * the cache — the hazard on exchange- and sort-elided bucketed
  * reads). NULL keys or timestamps never match: a null left key/ts
  * emits the left-outer null row; null right keys/ts are discarded on
  * sight (they sort first under Ascending, so discarding preserves
  * the merge).
  *
  * Determinism contract: among equal (key, ts) right rows the LAST in
  * sort order wins for backward, the FIRST for forward — the same tie
  * classes as the window forms' last()/first(). `forward = true`
  * flips the direction: EARLIEST right row with rightTs >= leftTs
  * (next-event attribution) — the same merge pass peeking the head
  * instead of keeping a running candidate. `tolerance = Some(d)`
  * bounds staleness: a candidate only matches within |leftTs −
  * rightTs| <= d (in the ts column's own units) — the form real
  * event attribution needs (a quote from last month must not price
  * today's trade); requires an integral/timestamp ts type.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {

  AsofJoin.validate(leftKey, rightKey, leftTs, rightTs, tolerance)

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
    case AsofJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryExecNode {

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

  // Only called when `tolerance` is set, which validate() restricts to
  // integral/date/timestamp ts types — all of which eval to a boxed
  // integral.
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
    case other => throw new IllegalStateException(
      s"non-integral as-of timestamp under tolerance: $other")
  }

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
    val hasTol = tolerance.isDefined
    val tol = tolerance.getOrElse(Long.MaxValue)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      var matchRow: InternalRow = null
      var matchKey: Any = null
      var matchTs: Long = 0L
      lIter.map { lRow =>
        val k = lkB.eval(lRow)
        val t = ltB.eval(lRow)
        if (k == null || t == null) {
          // null keys/ts never match; do NOT advance the right side —
          // null-key left rows sort first, so the merge stays aligned
          project(joiner(lRow, nullRight))
        } else if (forward) {
          // discard right rows that can match neither this left row
          // (needs rts >= t) nor any later one (their ts only grows);
          // the surviving head is PEEKED, never consumed - it may also
          // be the match for the next left row.
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rkB.eval(head)
            if (hk == null) { rBuf.next() } // unmatched by contract
            else {
              val cmp = keyOrdering.compare(hk, k)
              if (cmp < 0) rBuf.next()
              else if (cmp == 0) {
                val rts = rtB.eval(head)
                if (rts == null || tsOrdering.compare(rts, t) < 0) rBuf.next()
                else advance = false
              } else advance = false
            }
          }
          val m =
            if (rBuf.hasNext && keyOrdering.compare(rkB.eval(rBuf.head), k) == 0 &&
                (!hasTol || asLong(rtB.eval(rBuf.head)) - asLong(t) <= tol))
              rBuf.head
            else nullRight
          project(joiner(lRow, m))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rkB.eval(head)
            if (hk == null) { rBuf.next() } // unmatched by contract
            else {
              val cmp = keyOrdering.compare(hk, k)
              if (cmp < 0) {
                rBuf.next() // stale key, discard
              } else if (cmp == 0) {
                val rts = rtB.eval(head)
                if (rts == null) { rBuf.next() } // unmatched by contract
                else if (tsOrdering.compare(rts, t) <= 0) {
                  // O(1) running candidate. COPY the cached key/ts —
                  // the evaluated objects (UTF8String etc.) can point
                  // into reused page memory on exchange-elided
                  // bucketed reads and would mutate under the cache
                  // when the next batch loads.
                  matchRow = rBuf.next().copy()
                  matchKey = InternalRow.copyValue(k)
                  if (hasTol) matchTs = asLong(rts)
                } else advance = false
              } else advance = false
            }
          }
          val m =
            if (matchRow != null && keyOrdering.compare(matchKey, k) == 0 &&
                (!hasTol || asLong(t) - matchTs <= tol)) matchRow
            else nullRight
          project(joiner(lRow, m))
        }
      }
    }
  }
}

object AsofJoin {
  import org.apache.spark.sql.GraftColumnBridge

  /** The build-time type contract (shared by the builder and the plan
    * constructor so programmatic construction fails loudly too): keys
    * and timestamps must be atomic types on BOTH sides with matching
    * types per role; a staleness tolerance additionally needs a ts
    * type with integral physical representation (integral, date,
    * timestamp) so the distance arithmetic is exact.
    */
  private[plans] def validate(leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression, tolerance: Option[Long]): Unit = {
    // concrete public types (AtomicType itself is sql-private in Spark 4)
    def isAtomic(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType | BinaryType => true
      case _: DecimalType => true
      case _ => false
    }
    def atomic(e: Expression, role: String): Unit =
      if (!isAtomic(e.dataType)) throw new IllegalArgumentException(
        s"as-of $role must be an atomic type, got ${e.dataType}")
    atomic(leftKey, "key"); atomic(rightKey, "key")
    atomic(leftTs, "timestamp"); atomic(rightTs, "timestamp")
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    require(leftTs.dataType == rightTs.dataType,
      s"as-of timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
    def integralTs(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(tolerance.isEmpty || integralTs(leftTs.dataType),
      s"as-of tolerance needs an integral/date/timestamp ts type, got ${leftTs.dataType}")
    require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
  }

  /** As-of join `left` to `right` on equal `key`, latest `rightTs` at
    * or before `leftTs`; left outer. Names resolve against the
    * respective side's analyzed output (session-conf resolver).
    * `tolerance` (ts units) bounds |leftTs − rightTs|; `forward`
    * flips to earliest-at-or-after.
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = leftDf.sparkSession
    val lPlan = GraftColumnBridge.logicalPlan(leftDf)
    val rPlan = GraftColumnBridge.logicalPlan(rightDf)
    def resolve(name: String, plan: LogicalPlan): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      resolve(leftKey, lPlan), resolve(rightKey, rPlan),
      resolve(leftTs, lPlan), resolve(rightTs, rPlan), forward, tolerance))
  }
}
