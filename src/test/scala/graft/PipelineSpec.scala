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

  test("dsir-gated pipeline: minhash twin equals the ngram form; funnel monotone") {
    val ngram = Pipeline.pipelineCurateDsir(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mh = Pipeline.pipelineCurateDsirMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mh === ngram)
    // funnel: corpus >= quality >= dedup >= decontam; splits partition s3
    assert(ngram("0_corpus") >= ngram("1_quality"))
    assert(ngram("1_quality") >= ngram("2_dedup"))
    assert(ngram("2_dedup") >= ngram("3_decontam"))
    val splitSum = ngram.collect { case (k, v) if k.startsWith("4_") => v }.sum
    assert(splitSum === ngram("3_decontam"))
  }

  test("pretrain census: funnel extends monotonically, shards partition chunks") {
    val rows = Pipeline.pipelinePretrain(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs funnel keeps shrinking through train selection and the cap
    val funnel = Seq("0_corpus", "1_quality", "2_dedup", "3_decontam",
      "4_train", "5_cap").map(rows)
    assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $rows")
    assert(funnel.last > 0, s"cap stage emptied the corpus: $rows")
    // chunking re-expands: at least one chunk per capped doc
    assert(rows("6_chunks") >= rows("5_cap"), s"fewer chunks than docs: $rows")
    // shard counts partition the chunks
    val shardSum = rows.collect { case (k, v) if k.startsWith("7_shard_") => v }.sum
    assert(shardSum === rows("6_chunks"),
      s"shards ($shardSum) must partition the chunks: $rows")
    // curate stages agree between the two composed queries
    val curate = Pipeline.pipelineCurate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("0_corpus", "1_quality", "2_dedup", "3_decontam").foreach { k =>
      assert(rows(k) === curate(k), s"$k disagrees with pipeline_curate")
    }
    assert(rows("4_train") === curate("4_train"))
  }

  test("model-gated pipeline: minhash twin equals the ngram form, same stage-1 budget as the heuristic gate") {
    val ngram = Pipeline.pipelineCurateModel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mh = Pipeline.pipelineCurateModelMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mh === ngram)
    // funnel monotone and non-empty
    val funnel = Seq("0_corpus", "1_quality", "2_dedup", "3_decontam").map(ngram)
    assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b }, s"$ngram")
    assert(funnel.last > 0)
    // same per-lang 75% budget as the heuristic gate: stage-1 counts
    // may differ only by per-lang tie handling at the threshold
    val heuristic = Pipeline.pipelineCurate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ngram("0_corpus") === heuristic("0_corpus"))
    val diff = math.abs(ngram("1_quality") - heuristic("1_quality"))
    assert(diff <= heuristic("0_corpus") / 10,
      s"model gate budget drifted: model=${ngram("1_quality")} heuristic=${heuristic("1_quality")}")
  }

  test("model-gated pretrain agrees with the model-gated curate on shared stages") {
    val pm = Pipeline.pipelinePretrainModel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cm = Pipeline.pipelineCurateModel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("0_corpus", "1_quality", "2_dedup", "3_decontam").foreach { k =>
      assert(pm(k) === cm(k), s"$k disagrees between pretrain_model and curate_model")
    }
    assert(pm("4_train") === cm("4_train"))
    val shardSum = pm.collect { case (k, v) if k.startsWith("7_shard_") => v }.sum
    assert(shardSum === pm("6_chunks"))
  }

  test("pretrain matrix cells: dsir/model minhash twins equal their ngram forms") {
    val dsirNgram = Pipeline.pipelinePretrainDsir(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dsirMh = Pipeline.pipelinePretrainDsirMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dsirMh === dsirNgram)
    val modelNgram = Pipeline.pipelinePretrainModel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val modelMh = Pipeline.pipelinePretrainModelMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(modelMh === modelNgram)
    // the dsir pretrain shares its curate stages with pipeline_curate_dsir
    val curate = Pipeline.pipelineCurateDsir(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    curate.keys.filterNot(_.startsWith("4_")).foreach { k =>
      assert(dsirNgram(k) === curate(k), s"stage $k")
    }
  }

  test("pretrain minhash twin equals the ngram-edged (oracle) form on sf0.001") {
    val ngram = Pipeline.pipelinePretrain(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mh = Pipeline.pipelinePretrainMinhash(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mh === ngram)
  }
}
