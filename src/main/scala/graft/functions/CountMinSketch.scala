package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan '05) as a mergeable Spark
  * aggregate — the POINT-FREQUENCY member of the sketch suite
  * (distinct = KMV/HLL, frequent set = Misra-Gries, membership =
  * Bloom, quantiles = bottom-k; CMS answers "how often did THIS key
  * occur" for keys chosen after the scan).
  *
  * Depth×width counter grid; a row's position for a key comes from
  * Kirsch–Mitzenmacher double hashing over a caller-supplied 64-bit
  * hash (same h1 + i·h2 derivation as [[BloomFilterUtil]] — one hash
  * evaluation per arrival regardless of depth). Update adds 1 to one
  * counter per row; merge is ELEMENTWISE SUM, so Spark runs map-side
  * partials and the grid crossing the shuffle is depth·width longs
  * regardless of stream size or vocabulary. Estimate = min over rows:
  * NEVER an undercount; overcount ≤ e/width · n with probability
  * ≥ 1 − e^−depth (CountMinSpec asserts both sides).
  */
class CountMinAggregator(depth: Int, width: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    CountMinUtil.add(buf, depth, width, hash)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  def sketch(depth: Int, width: Int): TypedColumn[Long, Array[Long]] =
    new CountMinAggregator(depth, width).toColumn
}

/** Shared add/estimate kernel (static so generated or driver code can
  * call it on a collected grid).
  */
object CountMinUtil {
  private def h2Of(hash: Long): Long =
    BloomFilterUtil.fmix64(hash ^ 0x9e3779b97f4a7c15L) | 1L

  def add(grid: Array[Long], depth: Int, width: Int, hash: Long): Unit = {
    val h2 = h2Of(hash)
    var i = 0
    while (i < depth) {
      val slot = (((hash + i.toLong * h2) & Long.MaxValue) % width).toInt
      grid(i * width + slot) += 1L
      i += 1
    }
  }

  /** Point estimate: min over the depth rows — always >= true count. */
  def estimate(grid: Array[Long], depth: Int, width: Int, hash: Long): Long = {
    val h2 = h2Of(hash)
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val slot = (((hash + i.toLong * h2) & Long.MaxValue) % width).toInt
      val c = grid(i * width + slot)
      if (c < est) est = c
      i += 1
    }
    est
  }
}
