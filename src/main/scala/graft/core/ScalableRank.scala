package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Range-partitioned total-order primitives — the scale-safe
  * replacement for `Window.orderBy(...)` with no partition key.
  *
  * An unpartitioned `WindowExec` moves the ENTIRE input to one
  * partition: at sf0.1 it is a warning (`WindowExec: No Partition
  * Defined`), at 100 TB it is one core sorting the corpus and the
  * first executor to OOM. Every global rank / ntile / cumulative sum
  * in this repo goes through the two-pass form instead:
  *
  *   1. `repartitionByRange(sortCols)` — a PARALLEL global sort
  *      (Spark samples range boundaries; every partition sorts its
  *      slice independently), then
  *   2. [[graft.plans.GlobalRunningSumPlan]] — the custom physical
  *      operator that runs one lightweight subtotal job over the SAME
  *      executed child (|parts|·|values| longs of driver state) and
  *      appends the offset-adjusted running sums map-side, at the
  *      `UnsafeRow` level.
  *
  * Unlike the r13 `RDD.zipWithIndex` formulation this is a lazy plan
  * with no Row-object round-trip — downstream stages resume
  * whole-stage codegen above the operator, and nothing executes at
  * DataFrame-construction time. Boundary consistency between the two
  * passes is structural (one `child.execute()`, one shuffle
  * dependency — see GlobalRunningSum's scaladoc for why the
  * pure-relational ReuseExchange formulation is NOT sound). `parts`
  * is passed explicitly to `repartitionByRange`, so AQE never
  * coalesces the exchange.
  *
  * Determinism: range-boundary sampling is nondeterministic, but the
  * emitted sequence depends only on the TOTAL order — callers must
  * pass fully tie-broken sort keys. A task retry re-reads the same
  * shuffle partition in the same sorted order, so the running sums
  * are retry-safe.
  */
object ScalableRank {

  private def defaultParts(df: DataFrame): Int =
    math.max(1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "8").toInt)

  /** `col(name)` with backtick quoting, so dotted/spaced caller names
    * resolve as one column (ADVICE r13). */
  private def bq(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** The shared two-pass core: appends, for each `(value, out)` pair,
    * the global inclusive running sum of `value` in `sortCols` order
    * as column `out`. `values` must be LongType expressions; nulls
    * count as 0.
    */
  private def withRunningSums(df: DataFrame, parts: Int, sortCols: Seq[Column],
      mkValues: Seq[Attribute] => Seq[Expression], outCols: Seq[String]): DataFrame = {
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val plan = GraftColumnBridge.logicalPlan(sorted)
    val outAttrs = outCols.map(o =>
      AttributeReference(o, LongType, nullable = false)())
    GraftColumnBridge.ofRows(df.sparkSession,
      graft.plans.GlobalRunningSumPlan(plan, mkValues(plan.output), outAttrs))
  }

  /** Resolve `name` against the child's analyzed output (session
    * resolver — the AsofJoin convention), cast to LongType.
    */
  private def longValue(df: DataFrame, attrs: Seq[Attribute], name: String): Expression = {
    val resolver = df.sparkSession.sessionState.conf.resolver
    val a = attrs.find(at => resolver(at.name, name)).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in ${attrs.map(_.name)}"))
    if (a.dataType == LongType) a else Cast(a, LongType)
  }

  /** Appends a global 1-based row number `out` (LongType) in
    * `sortCols` order. `sortCols` must be a total order (tie-broken)
    * for a deterministic result.
    */
  def rowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame =
    rowNumberWith(df, out, defaultParts(df), sortCols: _*)

  def rowNumberWith(df: DataFrame, out: String, parts: Int, sortCols: Column*): DataFrame =
    withRunningSums(df, parts, sortCols, _ => Seq(Literal(1L)), Seq(out))

  /** Appends inclusive running sums of the integral columns
    * `valueCols` (as `outCols`, positionally, LongType) in `sortCols`
    * order. Nulls count as 0. Non-integral value columns are rejected
    * up front (ADVICE r13: the old Row accessor deferred the failure
    * to job runtime).
    */
  def prefixSums(df: DataFrame, valueCols: Seq[String], outCols: Seq[String],
      sortCols: Column*): DataFrame =
    prefixSumsWith(df, valueCols, outCols, defaultParts(df), sortCols: _*)

  def prefixSumsWith(df: DataFrame, valueCols: Seq[String], outCols: Seq[String],
      parts: Int, sortCols: Column*): DataFrame = {
    require(valueCols.length == outCols.length, "valueCols/outCols arity")
    valueCols.foreach { v =>
      val dt = df.schema(v).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"prefixSums value column '$v' must be integral, got ${dt.simpleString}")
    }
    withRunningSums(df, parts, sortCols,
      attrs => valueCols.map(longValue(df, attrs, _)), outCols)
  }

  /** Single-column convenience form of [[prefixSums]]. */
  def prefixSum(df: DataFrame, valueCol: String, out: String, sortCols: Column*): DataFrame =
    prefixSums(df, Seq(valueCol), Seq(out), sortCols: _*)

  /** Per-group 1-based rank + group size over corpus-scale groups
    * with SMALL group cardinality (lang / source / event_type): a
    * `Window.partitionBy(group)` would put EACH group's whole
    * population on one core (groups are few, populations are huge).
    * Instead: ONE range-partitioned global sort on (group, sortCols)
    * ([[rowNumber]]) + per-group offsets from a prefix sum over the
    * \|groups\|-cell count frame, rank = global − offset. Emits
    * `rnOut` (1-based within group) and `sizeOut` (group size —
    * feed both to [[ntileExpr]] for a per-group NTILE).
    *
    * A NULL group key is a group like any other (the
    * `Window.partitionBy` / DuckDB `PARTITION BY` semantics): the
    * offset join is null-safe (ADVICE r13 — lang/source/event_type
    * are optional in the parquet schema, and an equi-join would
    * silently DROP null-keyed rows).
    */
  def groupedRank(df: DataFrame, groupCol: String, rnOut: String,
      sizeOut: String, sortCols: Column*): DataFrame = {
    val counts = df.groupBy(bq(groupCol)).agg(count(lit(1)).as(sizeOut))
    val offs = prefixSum(counts, sizeOut, "__cum_g", bq(groupCol).asc)
      .select(bq(groupCol).as("__srk_grp"), col(sizeOut),
        (col("__cum_g") - col(sizeOut)).as("__off"))
    rowNumber(df, "__grn", (bq(groupCol).asc +: sortCols): _*)
      .join(broadcast(offs), bq(groupCol) <=> col("__srk_grp"))
      .withColumn(rnOut, col("__grn") - col("__off"))
      .drop("__grn", "__off", "__srk_grp")
  }

  /** Per-group inclusive running sums of integral `valueCols` (as
    * `outCols`) in `sortCols` order — the grouped form of
    * [[prefixSums]], same shape as [[groupedRank]]: one global range
    * sort + per-group value offsets from the \|groups\|-cell totals
    * frame. Never a per-group window partition. Null group keys form
    * their own group (null-safe offset join); a group whose values
    * are all NULL totals 0 (ADVICE r13 — consistent with the
    * ungrouped "nulls count as 0" contract).
    */
  def groupedPrefixSums(df: DataFrame, groupCol: String,
      valueCols: Seq[String], outCols: Seq[String],
      sortCols: Column*): DataFrame = {
    require(valueCols.length == outCols.length, "valueCols/outCols arity")
    val tCols = valueCols.map("__t_" + _)
    val aggs = valueCols.zip(tCols).map { case (v, t) =>
      coalesce(sum(bq(v)), lit(0L)).as(t)
    }
    val totals = df.groupBy(bq(groupCol)).agg(aggs.head, aggs.tail: _*)
    val cCols = valueCols.map("__c_" + _)
    val offs = prefixSums(totals, tCols, cCols, bq(groupCol).asc)
      .select(bq(groupCol).as("__srk_grp") +: valueCols.map { v =>
        (col("__c_" + v) - col("__t_" + v)).as("__o_" + v)
      }: _*)
    val gCols = valueCols.map("__g_" + _)
    val glob = prefixSums(df, valueCols, gCols,
      (bq(groupCol).asc +: sortCols): _*)
      .join(broadcast(offs), bq(groupCol) <=> col("__srk_grp"))
    valueCols.zip(outCols).foldLeft(glob) { case (acc, (v, o)) =>
      acc.withColumn(o, col("__g_" + v) - col("__o_" + v))
    }.drop("__srk_grp" +: (gCols ++ valueCols.map("__o_" + _)): _*)
  }

  /** SQL `NTILE(k)` from a 1-based row number column `rnCol` and a
    * group-size column `nCol` (both LongType expressions by name):
    * the first `n % k` tiles get `n div k + 1` rows, the rest
    * `n div k` — exactly Spark's and DuckDB's NTILE, so a
    * [[rowNumber]]-derived tile is hash-identical to the window form.
    * Names are backtick-quoted before SQL interpolation (ADVICE r13).
    */
  def ntileExpr(rnCol: String, nCol: String, k: Int): Column = {
    def esc(s: String): String = "`" + s.replace("`", "``") + "`"
    val rn = esc(rnCol)
    val q = s"(${esc(nCol)} div $k)"
    val r = s"(${esc(nCol)} % $k)"
    expr(
      s"""CASE WHEN $rn <= $r * ($q + 1)
         |     THEN ($rn + $q) div ($q + 1)
         |     ELSE $r + ($rn - $r * ($q + 1) + $q - 1) div $q END""".stripMargin)
  }
}
