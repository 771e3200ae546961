package graft

import org.apache.spark.sql.functions._
import graft.queries.Dsir

/** DSIR importance-resampling contracts: the weight is a target-vs-raw
  * log-likelihood ratio, so the target slice must score higher in
  * aggregate; the Gumbel-top-k sample is a fixed-size, deterministic,
  * duplicate-free draw.
  */
class DsirSpec extends SparkSuite {

  private lazy val weights = Dsir.dsirWeights(spark, sfDir).cache()

  test("every tokenizable document gets exactly one weight row") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tokenizable = docs
      .where(size(filter(split(col("text"), "[^\\p{L}]+"), w => length(w) > 0)) > 0)
      .count()
    assert(weights.count() === tokenizable)
    assert(weights.select("doc_id").distinct().count() === tokenizable)
  }

  test("target slice (en) outscores the rest in aggregate") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val byLang = weights.join(docs, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("dsir_w").as("m"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
      .toMap
    assert(byLang(true) > byLang(false),
      s"mean en weight ${byLang(true)} must exceed non-en ${byLang(false)}")
  }

  test("gumbel sample: fixed size, distinct docs, descending keys, stable") {
    val s1 = Dsir.dsirSample(spark, sfDir).collect().sortBy(_.getInt(2))
    assert(s1.length === math.min(Dsir.SampleK, weights.count()).toInt)
    assert(s1.map(_.getLong(0)).distinct.length === s1.length)
    val keys = s1.map(_.getDouble(1))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    val s2 = Dsir.dsirSample(spark, sfDir).collect().sortBy(_.getInt(2))
    assert(s1.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      s2.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
