package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range-partitioned total-order primitives — the scale-safe
  * replacement for `Window.orderBy(...)` with no partition key.
  *
  * An unpartitioned `WindowExec` moves the ENTIRE input to one
  * partition: at sf0.1 it is a warning (`WindowExec: No Partition
  * Defined`), at 100 TB it is one core sorting the corpus and the
  * first executor to OOM. Every global rank / ntile / cumulative sum
  * in this repo goes through the two-pass form instead (the
  * `shard_pack` idiom, Sharding.scala):
  *
  *   1. `repartitionByRange(sortCols)` — a PARALLEL global sort
  *      (Spark samples range boundaries; every partition sorts its
  *      slice independently), then
  *   2. one lightweight extra job computing per-partition counts (or
  *      sums) → per-partition offsets, applied map-side. No second
  *      shuffle, no single-partition stage anywhere.
  *
  * Determinism: range-boundary sampling is nondeterministic, but the
  * emitted sequence depends only on the TOTAL order — callers must
  * pass fully tie-broken sort keys. The offset job makes DataFrame
  * construction eager (same contract as `RDD.zipWithIndex`, which
  * `shard_pack` already relies on); upstream plans are recomputed by
  * the two passes, so callers `.stable` any expensive input first.
  */
object ScalableRank {

  private def defaultParts(df: DataFrame): Int =
    math.max(1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "8").toInt)

  /** Appends a global 1-based row number `out` (LongType) in
    * `sortCols` order. `sortCols` must be a total order (tie-broken)
    * for a deterministic result.
    */
  def rowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame =
    rowNumberWith(df, out, defaultParts(df), sortCols: _*)

  def rowNumberWith(df: DataFrame, out: String, parts: Int, sortCols: Column*): DataFrame = {
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Appends inclusive running sums of the LongType columns
    * `valueCols` (as `outCols`, positionally) in `sortCols` order.
    * Nulls count as 0. One extra job computes per-partition subtotals
    * (the offsets); the running sums themselves are map-side.
    */
  def prefixSums(df: DataFrame, valueCols: Seq[String], outCols: Seq[String],
      sortCols: Column*): DataFrame =
    prefixSumsWith(df, valueCols, outCols, defaultParts(df), sortCols: _*)

  def prefixSumsWith(df: DataFrame, valueCols: Seq[String], outCols: Seq[String],
      parts: Int, sortCols: Column*): DataFrame = {
    require(valueCols.length == outCols.length, "valueCols/outCols arity")
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val idxs = valueCols.map(sorted.schema.fieldIndex).toArray
    val k = idxs.length
    def longAt(r: Row, i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    // ONE materialized RDD: the subtotal job and the output pass must
    // see identical range boundaries (a fresh .rdd could resample).
    val rdd = sorted.rdd
    val partSums: Array[Array[Long]] = rdd
      .mapPartitions { it =>
        val acc = new Array[Long](k)
        it.foreach(r => { var j = 0; while (j < k) { acc(j) += longAt(r, idxs(j)); j += 1 } })
        Iterator.single(acc)
      }.collect()
    val offsets = partSums.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => a(j) + b(j))
    }
    val schema = outCols.foldLeft(sorted.schema)(_.add(_, LongType, nullable = false))
    val res = rdd.mapPartitionsWithIndex { (pi, it) =>
      val acc = offsets(pi).clone()
      it.map { r =>
        var j = 0
        while (j < k) { acc(j) += longAt(r, idxs(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    df.sparkSession.createDataFrame(res, schema)
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
    */
  def groupedRank(df: DataFrame, groupCol: String, rnOut: String,
      sizeOut: String, sortCols: Column*): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as(sizeOut))
    val offs = prefixSum(counts, sizeOut, "__cum_g", col(groupCol).asc)
      .select(col(groupCol), col(sizeOut),
        (col("__cum_g") - col(sizeOut)).as("__off"))
    rowNumber(df, "__grn", (col(groupCol).asc +: sortCols): _*)
      .join(broadcast(offs), groupCol)
      .withColumn(rnOut, col("__grn") - col("__off"))
      .drop("__grn", "__off")
  }

  /** Per-group inclusive running sums of LongType `valueCols` (as
    * `outCols`) in `sortCols` order — the grouped form of
    * [[prefixSums]], same shape as [[groupedRank]]: one global range
    * sort + per-group value offsets from the \|groups\|-cell totals
    * frame. Never a per-group window partition.
    */
  def groupedPrefixSums(df: DataFrame, groupCol: String,
      valueCols: Seq[String], outCols: Seq[String],
      sortCols: Column*): DataFrame = {
    require(valueCols.length == outCols.length, "valueCols/outCols arity")
    val tCols = valueCols.map("__t_" + _)
    val aggs = valueCols.zip(tCols).map { case (v, t) => sum(col(v)).as(t) }
    val totals = df.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val cCols = valueCols.map("__c_" + _)
    val offs = prefixSums(totals, tCols, cCols, col(groupCol).asc)
      .select(col(groupCol) +: valueCols.map { v =>
        (col("__c_" + v) - col("__t_" + v)).as("__o_" + v)
      }: _*)
    val gCols = valueCols.map("__g_" + _)
    val glob = prefixSums(df, valueCols, gCols,
      (col(groupCol).asc +: sortCols): _*)
      .join(broadcast(offs), groupCol)
    valueCols.zip(outCols).foldLeft(glob) { case (acc, (v, o)) =>
      acc.withColumn(o, col("__g_" + v) - col("__o_" + v))
    }.drop(gCols ++ valueCols.map("__o_" + _): _*)
  }

  /** SQL `NTILE(k)` from a 1-based row number column `rnCol` and a
    * group-size column `nCol` (both LongType expressions by name):
    * the first `n % k` tiles get `n div k + 1` rows, the rest
    * `n div k` — exactly Spark's and DuckDB's NTILE, so a
    * [[rowNumber]]-derived tile is hash-identical to the window form.
    */
  def ntileExpr(rnCol: String, nCol: String, k: Int): Column = {
    val q = s"($nCol div $k)"
    val r = s"($nCol % $k)"
    expr(
      s"""CASE WHEN $rnCol <= $r * ($q + 1)
         |     THEN ($rnCol + $q) div ($q + 1)
         |     ELSE $r + ($rnCol - $r * ($q + 1) + $q - 1) div $q END""".stripMargin)
  }
}
