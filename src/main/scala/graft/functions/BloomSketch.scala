package graft.functions

import org.apache.spark.sql.{Column, Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Classic Bloom filter as a mergeable Spark aggregate — the
  * MEMBERSHIP member of the sketch suite (distinct = KMV/HLL,
  * frequency = Misra-Gries, quantiles = bottom-k sample, membership =
  * Bloom). Insert/probe run over a caller-supplied 64-bit hash (use
  * `xxhash64(col)` — codegen'd, no string re-hash per probe) expanded
  * to k bit positions by Kirsch–Mitzenmacher double hashing
  * (h1 + i·h2 mod m, "Less hashing, same performance", RSA 2006) —
  * ONE hash evaluation per row however many probe bits.
  *
  * Contract: NO false negatives ever (every inserted element probes
  * true — BloomSpec property); false-positive rate ≈ (1−e^(−kn/m))^k,
  * so m ≈ 9.6·n bits with k = 7 gives ~1%. Merge of same-shape
  * filters is word-wise OR, so the aggregation is map-side partial +
  * associative merge, O(m/64) state per partial regardless of set
  * size — the same bounded-merge shape as the other sketch
  * aggregators. The finished filter is m/8 bytes: a filter over
  * MILLIONS of benchmark shingles is a few MB — broadcastable where
  * the exact string set (30+ B/shingle + hash-map overhead) is not.
  */
class BloomAggregator(numBits: Int, numHashes: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1, "numHashes must be >= 1")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    BloomFilterUtil.insert(buf, numHashes, hash)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  def sketch(numBits: Int, numHashes: Int): TypedColumn[Long, Array[Long]] =
    new BloomAggregator(numBits, numHashes).toColumn
}

/** Shared insert/probe kernel; static so generated code can call it. */
object BloomFilterUtil {
  /** Murmur3 fmix64 finalizer — full-avalanche mix deriving the
    * second K-M hash from the first.
    */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def insert(words: Array[Long], k: Int, hash: Long): Unit = {
    val m = words.length.toLong * 64L
    val h2 = fmix64(hash ^ 0x9e3779b97f4a7c15L) | 1L // odd → full-period stride
    var i = 0
    while (i < k) {
      val bit = ((hash + i.toLong * h2) & Long.MaxValue) % m
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  def mightContain(words: Array[Long], k: Int, hash: Long): Boolean = {
    val m = words.length.toLong * 64L
    val h2 = fmix64(hash ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val bit = ((hash + i.toLong * h2) & Long.MaxValue) % m
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Codegen'd probe against a PLAN-TIME filter (the words ship with
  * the serialized expression and surface as a reference object in
  * generated code — same plan-time-literal pattern as the IVF
  * centroids and [[HyperplaneSigs]] planes). Stays inside whole-stage
  * codegen, so a bloom-prefiltered scan keeps its single codegen span.
  */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects bigint (a 64-bit hash), got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    BloomFilterUtil.mightContain(words, k, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomFilterUtil.mightContain($w, $k, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"

  // Case-class equality on Array[Long] is reference identity, which
  // would stop semantically identical probes from canonicalizing (and
  // thus from subexpression elimination). Compare filter CONTENT.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      b.k == k && b.child == child && java.util.Arrays.equals(b.words, words)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(words)))
}

object BloomMightContain {
  def probe(hashCol: Column, words: Array[Long], k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.GraftColumnBridge.expression(hashCol), words, k))
}
