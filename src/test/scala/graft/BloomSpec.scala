package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomAggregator, BloomFilterUtil, BloomMightContain}
import graft.queries.Dedup

/** Contract tests for the Bloom membership sketch
  * (functions/BloomSketch.scala): the no-false-negative property under
  * distributed aggregation (map-side partial + word-wise-OR merge),
  * interpreted-vs-codegen agreement for the probe expression, a loose
  * false-positive-rate sanity bound, and content-based expression
  * equality (canonicalization/CSE eligibility).
  */
class BloomSpec extends SparkSuite {

  private val Bits = 64 * 256 // 16384 bits
  private val K = 7

  private def buildFilter(hashes: Seq[Long], parts: Int): Array[Long] = {
    import spark.implicits._
    // parts > 1 forces real map-side partials + cross-partition merge
    spark.createDataset(hashes).repartition(parts)
      .select(BloomAggregator.sketch(Bits, K)).head()
  }

  test("no false negatives: every inserted hash probes true after partial+merge") {
    val rnd = new scala.util.Random(42)
    val hashes = Seq.fill(1000)(rnd.nextLong())
    val words = buildFilter(hashes, parts = 4)
    // kernel probe
    hashes.foreach { h =>
      assert(BloomFilterUtil.mightContain(words, K, h), s"false negative for $h")
    }
    // expression probe over a DataFrame (whole-stage codegen path)
    import spark.implicits._
    val got = hashes.toDF("h")
      .select(BloomMightContain.probe(col("h"), words, K).as("m"))
      .collect().map(_.getBoolean(0))
    assert(got.forall(identity), "expression probe lost an inserted element")
  }

  test("merge across partition counts is order-insensitive: same filter bytes") {
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(500)(rnd.nextLong())
    val a = buildFilter(hashes, parts = 1)
    val b = buildFilter(hashes, parts = 4)
    assert(java.util.Arrays.equals(a, b),
      "word-wise OR merge must be order/partitioning-independent")
  }

  test("interpreted eval agrees with codegen for probe") {
    val rnd = new scala.util.Random(99)
    val inserted = Seq.fill(200)(rnd.nextLong())
    val words = buildFilter(inserted, parts = 2)
    val mixed = inserted.take(50) ++ Seq.fill(200)(rnd.nextLong())
    import spark.implicits._
    val df = mixed.toDF("h")
    val codegen = df
      .select(col("h"), BloomMightContain.probe(col("h"), words, K).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // interpreted: direct Expression.eval on a literal child
    import org.apache.spark.sql.catalyst.expressions.Literal
    mixed.foreach { h =>
      val interp = BloomMightContain(Literal(h), words, K)
        .eval(null).asInstanceOf[Boolean]
      assert(interp === codegen(h), s"interpreted != codegen for $h")
    }
  }

  test("false-positive rate stays near design point (~1% at 9.6 bits/key)") {
    val rnd = new scala.util.Random(1234)
    val inserted = Seq.fill(Bits / 10)(rnd.nextLong()) // n ≈ m/9.6 load
    val words = buildFilter(inserted, parts = 4)
    val insertedSet = inserted.toSet
    val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(insertedSet)
    val fp = probes.count(BloomFilterUtil.mightContain(words, K, _))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.05, s"false-positive rate $rate way above the ~1% design point")
  }

  test("probe expressions with equal filter content are equal (CSE-eligible)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val w1 = Array(1L, 2L, 3L)
    val w2 = Array(1L, 2L, 3L) // distinct array instance, same content
    val e1 = BloomMightContain(Literal(5L), w1, K)
    val e2 = BloomMightContain(Literal(5L), w2, K)
    assert(e1 === e2, "content-equal probes must compare equal")
    assert(e1.hashCode === e2.hashCode)
    assert(e1 !== BloomMightContain(Literal(5L), Array(1L, 2L, 4L), K))
    assert(e1 !== BloomMightContain(Literal(6L), w1, K))
  }

  test("dedup_incremental_bloom ≡ dedup_incremental (exact anti-join semantics)") {
    val plain = Dedup.dedupIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = Dedup.dedupIncrementalBloom(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bloom === plain)
    assert(plain.nonEmpty)
  }
}
