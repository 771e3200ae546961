package graft

import graft.queries.Pipeline

/** Composition invariants of the end-to-end curation pipeline (stage
  * logic is oracle-checked; these pin the wiring).
  */
class PipelineSpec extends SparkSuite {

  test("curate funnel is monotone and split counts partition the survivors") {
    val rows = Pipeline.pipelineCurate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = Seq("0_corpus", "1_quality", "2_dedup", "3_decontam").map(rows)
    assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $rows")
    assert(funnel.head > 0 && funnel.last > 0)
    val splitSum = rows.collect { case (k, v) if k.startsWith("4_") => v }.sum
    assert(splitSum === rows("3_decontam"),
      s"splits ($splitSum) must partition stage-3 survivors: $rows")
  }

  test("minhash-edged pipeline equals the ngram-edged (oracle) form on sf0.001") {
    val ngram = Pipeline.pipelineCurate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mh = Pipeline.pipelineCurateMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mh === ngram)
  }
}
