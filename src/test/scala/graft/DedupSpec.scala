package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow")
  private val distinct1 = "completely different words about spark catalyst optimizer internals"
  private val corpus = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1),
    (3L, base), // exact dup of 0
    (4L, "tiny doc"), (5L, ""))
    .toDF("doc_id", "text")

  test("WordShingles expression matches declarative shingle chain") {
    graft.functions.WordShingles.register(spark)
    val native = corpus
      .select(col("doc_id"), expr("word_shingles(text)").as("sh"))
      .select(col("doc_id"), array_sort(col("sh")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val declarative = corpus
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), array_sort(Dedup.shinglesFromTokens(col("ws"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === declarative)
    assert(native(5L).isEmpty && native(4L).isEmpty) // <3 words → no shingles
  }

  test("MinHashBuckets expression matches declarative minhash formulation") {
    graft.functions.WordShingles.register(spark)
    graft.functions.MinHashBuckets.register(spark)
    val sh = corpus.filter(col("doc_id") < 3)
      .select(col("doc_id"), expr("word_shingles(text)").as("sh"))
    // Declarative twin restricted to signatures (band mixing differs in
    // constants, so compare the invariant: equal shingle sets ⇒ equal
    // buckets; different sets ⇒ (almost surely) different buckets.
    val buckets = sh.select(col("doc_id"), expr("minhash_buckets(sh)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(buckets(0L).size === 8)
    assert(buckets(0L) !== buckets(2L))
    // near-dup docs share most shingles → at least one band collides
    assert(buckets(0L).zip(buckets(1L)).count { case (a, b) => a == b } >= 1)
  }

  test("minhashPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((0L, 3L)) === 1.0, "exact dup must have jaccard 1.0")
    assert(asMap.contains((0L, 1L)) && asMap((0L, 1L)) > 0.5, "near dup found")
    assert(!asMap.contains((0L, 2L)) || asMap((0L, 2L)) < 0.2, "unrelated not near-dup")
  }

  test("minhash candidates agree with exact ngram ground truth on near-dups") {
    val exact = Dedup.ngramPairs(corpus)
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(corpus)
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === exact, "minhash must recover all high-jaccard pairs here")
  }

  test("simhash: identical docs hamming 0, near-dups close, unrelated far") {
    val sims = corpus.filter(length(col("text")) > 0)
      .select(col("doc_id"), expr(Dedup.simhashSql("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) === sims(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0L), sims(1L)) < hamming(sims(0L), sims(2L)))
  }

  test("dedupExact groups by content hash (registered query, sf0.001)") {
    val df = Dedup.dedupExact(spark, sfDir)
    val n = df.count()
    assert(n > 0)
    assert(df.filter(col("n_copies") < 1).count() === 0)
    assert(df.agg(sum("n_copies")).first().getLong(0) === 500)
  }
}
