package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch by deterministic bottom-k sampling: keep
  * the k rows with the SMALLEST deterministic uniform hash (the KMV
  * trick applied to row sampling), then answer quantile queries from
  * the retained values. The bottom-k set is a uniform row sample, so
  * rank error is O(1/√k); and because membership depends only on the
  * hash ORDER — not on partitioning, merge order, or engine — the
  * sketch is exactly reproducible, which is what lets the quantile
  * estimates sit under a DuckDB hash oracle (rank-k selection is
  * expressible in SQL) unlike interpolating sketches (t-digest, KLL)
  * whose state depends on ingestion order.
  *
  * Buffer: Vector of (hash, value) sorted by hash, capped at k — the
  * KmvAggregator/TopKAggregator bounded-merge shape: O(k) state per
  * group, map-side partial aggregation, O(k) merges. Groups smaller
  * than k degrade to EXACT discrete quantiles (the sample is the
  * group).
  */
class QuantileSketchAggregator(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && in._1 >= buf.last._1) buf
    else {
      val i = buf.indexWhere(_._1 >= in._1)
      if (i >= 0 && buf(i)._1 == in._1) buf // same row re-offered
      else {
        val ins = if (i < 0) buf :+ in else (buf.take(i) :+ in) ++ buf.drop(i)
        ins.take(k)
      }
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    var last = Double.NaN
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i)._1 <= b(j)._1)) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v._1 != last) { out += v; last = v._1; n += 1 }
    }
    out.result()
  }

  /** The sample's VALUES sorted ascending — callers answer quantile q
    * with element ⌈q·n⌉ (1-indexed discrete quantile).
    */
  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object QuantileSketchAggregator {
  def sketch(k: Int): TypedColumn[(Double, Long), Seq[Long]] =
    new QuantileSketchAggregator(k).toColumn
}
