package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Whole-operator BAND (interval) join as a first-class physical
  * operator — the second resident of the extension ladder's (c) tier
  * next to [[AsofJoinPlan]]: for every left row, ALL right rows with
  * the same key whose timestamp lies in
  * `[leftTs − before, leftTs + after]` (inner join, one output row
  * per match). The event-correlation primitive (errors × clicks
  * within ±10 min, trades × quotes in a window) that Spark's planner
  * turns into a BroadcastNestedLoopJoin when written as
  * `a.key = b.key AND b.ts BETWEEN a.ts − x AND a.ts + y` on
  * fact-sized inputs.
  *
  * Why a custom exec: with both children SMJ-shaped (co-partitioned
  * on the key, sorted by (key, ts) — declared via
  * requiredChildDistribution/Ordering so EnsureRequirements supplies
  * or elides the exchanges exactly as for a sort-merge join), one
  * merge pass with a sliding right-row buffer computes the join in
  * amortized O(|L| + |R| + |output|): the buffer's head only ever
  * advances (left timestamps are nondecreasing within a key), and
  * its size is bounded by the densest single band — the operator's
  * only state. No quadratic probe, no union, no window buffer.
  *
  * Contracts (enforced at plan build): keys atomic and same-typed
  * both sides; timestamps integral/date/timestamp (band arithmetic
  * must be exact) and same-typed; `before`/`after` ≥ 0 in the ts
  * column's own units. Buffered key/ts/rows are defensively copied
  * (the [[AsofJoinExec]] reused-page hazard). NULL keys or
  * timestamps never match and produce no output (inner-join
  * semantics); null right rows are discarded on sight.
  */
case class BandJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    before: Long, after: Long) extends BinaryNode {

  BandJoin.validate(leftKey, rightKey, leftTs, rightTs, before, after)

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: BandJoinPlan → BandJoinExec (injected by
  * [[graft.GraftExtensions]]).
  */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(l, r, lk, rk, lt, rt, b, a) =>
      BandJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, b, a) :: Nil
    case _ => Nil
  }
}

case class BandJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    before: Long, after: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
    case other => throw new IllegalStateException(
      s"non-integral band timestamp: $other")
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
    val b = before
    val a = after
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      // sliding band buffer: (copied key, ts, copied row), ts ascending
      val win = new java.util.ArrayDeque[(Any, Long, InternalRow)]()
      lIter.flatMap { lRow =>
        val k = lkB.eval(lRow)
        val tRaw = ltB.eval(lRow)
        if (k == null || tRaw == null) Iterator.empty
        else {
          val t = asLong(tRaw)
          // evict: rows of an older key, or below the band's left edge
          // (both classes can never match this or any later left row —
          // keys and timestamps are nondecreasing)
          var evicting = true
          while (evicting && !win.isEmpty) {
            val head = win.peekFirst()
            if (keyOrdering.compare(head._1, k) != 0 || head._2 < t - b)
              win.removeFirst()
            else evicting = false
          }
          // fill: pull right rows through the band's right edge
          var filling = true
          while (filling && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rkB.eval(head)
            if (hk == null) { rBuf.next() }
            else {
              val cmp = keyOrdering.compare(hk, k)
              if (cmp < 0) rBuf.next() // stale key — discard
              else if (cmp == 0) {
                val rts = rtB.eval(head)
                if (rts == null) { rBuf.next() }
                else {
                  val rt = asLong(rts)
                  if (rt <= t + a) {
                    val row = rBuf.next().copy()
                    // below-left-edge rows are still buffered cheaply:
                    // the next left row's eviction drops them; skipping
                    // them here would break later lefts whose band
                    // reaches back further than this one's
                    win.addLast((InternalRow.copyValue(hk), rt, row))
                  } else filling = false
                }
              } else filling = false
            }
          }
          // emit every buffered row inside this left row's band. The
          // projection reuses one output buffer, so project() runs at
          // next()-time (map), never ahead of the consumer — the
          // lookahead in filter caches only the buffer tuple.
          import scala.jdk.CollectionConverters._
          win.iterator().asScala
            .filter(e => e._2 >= t - b && e._2 <= t + a)
            .map(e => project(joiner(lRow, e._3)))
        }
      }
    }
  }
}

object BandJoin {
  import org.apache.spark.sql.GraftColumnBridge

  private[plans] def validate(leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression,
      before: Long, after: Long): Unit = {
    def isAtomic(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType | BinaryType => true
      case _: DecimalType => true
      case _ => false
    }
    def atomic(e: Expression, role: String): Unit =
      if (!isAtomic(e.dataType)) throw new IllegalArgumentException(
        s"band-join $role must be an atomic type, got ${e.dataType}")
    atomic(leftKey, "key"); atomic(rightKey, "key")
    require(leftKey.dataType == rightKey.dataType,
      s"band-join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    def integralTs(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(integralTs(leftTs.dataType) && leftTs.dataType == rightTs.dataType,
      s"band-join needs matching integral/date/timestamp ts types, got " +
        s"${leftTs.dataType} vs ${rightTs.dataType}")
    require(before >= 0 && after >= 0, "band-join bounds must be >= 0")
  }

  /** Band-join `left` to `right` on equal `key`, right rows with
    * `rightTs` in `[leftTs − before, leftTs + after]` (ts units);
    * inner, one row per match. */
  def band(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      before: Long, after: Long): DataFrame = {
    val spark = leftDf.sparkSession
    val lPlan = GraftColumnBridge.logicalPlan(leftDf)
    val rPlan = GraftColumnBridge.logicalPlan(rightDf)
    def resolve(name: String, plan: LogicalPlan): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark, BandJoinPlan(lPlan, rPlan,
      resolve(leftKey, lPlan), resolve(rightKey, rPlan),
      resolve(leftTs, lPlan), resolve(rightTs, rPlan), before, after))
  }
}
