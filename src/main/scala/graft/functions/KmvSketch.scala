package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) sketch over hashed set members, the
  * theta-sketch family's simplest member: keep the k SMALLEST of the
  * uniformly-hashed values in (0,1). Unlike HLL, KMV sketches support
  * set INTERSECTION estimation (audience overlap): with θ = the k-th
  * smallest of the merged sketch, every sketch is a uniform sample of
  * its set at rate θ, so |A∩B| ≈ |{x ∈ A∩B : x < θ}| / θ and distinct
  * counts ≈ (k−1)/θ (Beyer et al. 2007; Dasgupta et al.,
  * DataSketches theta).
  *
  * Buffer: sorted distinct Vector capped at k — same bounded-merge
  * shape as TopKAggregator (map-side partial + final merge, O(k)
  * state per group regardless of set size).
  */
class KmvAggregator(k: Int)
  extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], h: Double): Seq[Double] = {
    if (buf.length >= k && h >= buf.last) buf
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf // distinct
      else {
        val ins = if (i < 0) buf :+ h else (buf.take(i) :+ h) ++ buf.drop(i)
        ins.take(k)
      }
    }
  }

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    val out = Vector.newBuilder[Double]
    var (i, j, n) = (0, 0, 0)
    var last = Double.NaN
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last) { out += v; last = v; n += 1 }
    }
    out.result()
  }

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

object KmvAggregator {
  def sketch(k: Int): TypedColumn[Double, Seq[Double]] =
    new KmvAggregator(k).toColumn
}
