package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** The composed end-to-end curation pipeline ([EXT]) — the query a
  * user of this engine actually ships: quality gate → near-dup keep →
  * benchmark decontamination → leak-free split, with a per-stage
  * survivor census as the output artifact. Every stage reuses a
  * separately-oracle-verified operator (quality_filter's score,
  * dedup_keep's cluster keep, decontaminate's shingle overlap,
  * split_leakfree's cluster-atomic hash split), and the WHOLE
  * composition sits under one DuckDB hash gate, so stage wiring —
  * not just stage logic — is correctness-checked.
  *
  * Scale: each stage's plan law is inherited from its operator
  * (documented there); the only additions here are doc_id semi/anti
  * joins between stages (digest-width rows). The expensive shared
  * frames (stage-1 survivors, their shingle frame, the cluster labels)
  * are computed once and reused across stages; the registered
  * quadratic ngram edge producer is the oracle baseline — swap
  * Dedup.minhashScoredFromShingles for the linear path exactly as in
  * dedupClusterMinhash.
  */
object Pipeline {

  /** Benchmark/eval doc ids (decontaminate's convention): held out of
    * the corpus entirely and the source of contamination shingles.
    */
  private val BenchCap = 20

  /** Registered oracle form — quadratic ngram edges (the family's
    * verifiable baseline). The linear scale path is
    * [[pipelineCurateMinhash]], spec'd output-identical on sf0.001.
    */
  def pipelineCurate(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      cell = Some("heuristic_ngram"))

  /** The linear end-to-end form: MinHash+LSH verified edges feed the
    * keep and split stages — corpus + true-near-dup-pair cost, the
    * plan that runs at 100 TB.
    */
  def pipelineCurateMinhash(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      cell = Some("heuristic_minhash"))

  /** The shared stage chain: corpus, quality survivors (stabled),
    * their shingle frame (stabled — fed to BOTH the edge producer and
    * the stage-3 decontamination scan), cluster labels (stabled),
    * dedup survivors, decontaminated ids, per-doc split labels.
    * Callers MUST unpersist s1, sh1 and clusters when done (after
    * stabling their own output).
    */
  private[graft] case class Stages(corpus: DataFrame, s1: DataFrame,
      sh1: DataFrame, clusters: DataFrame, s2: DataFrame, s3: DataFrame,
      splits: DataFrame)

  /** Stage-1 ranking functions: both keep the per-lang top 75%, they
    * differ in WHO scores a doc — the heuristic composite
    * (quality_filter semantics) or the trained hashed-BoW classifier
    * margin ([[Classifier]], the distilled gate). Swapping the scorer
    * without touching the budget is exactly how production pipelines
    * A/B heuristic-vs-model filtering.
    */
  private[graft] def heuristicKeptIds(corpus: DataFrame): DataFrame =
    perLangQuantileKeep(TextOps.qualityPerDoc(corpus), "quality")

  /** Keep rows at-or-above the per-lang exact p25 of `scoreCol`. The
    * threshold is a groupBy aggregate (partial-merged value-count
    * cells) broadcast back onto the corpus — NOT an unordered
    * per-lang window, which would gather each language's whole
    * population on one partition to compute the same number.
    */
  private def perLangQuantileKeep(scored: DataFrame, scoreCol: String): DataFrame = {
    val thr = scored.groupBy("lang")
      .agg(expr(s"percentile($scoreCol, 0.25)").as("thr"))
    scored.join(broadcast(thr), "lang")
      .filter(col(scoreCol) >= col("thr"))
      .select("doc_id")
  }

  /** Model gate: train the classifier ON the corpus being curated
    * (self-distillation of the stopword gate), score every doc by its
    * margin, keep the per-lang top 75% by score. Margins are
    * floor-rounded at 1e-6 BEFORE the percentile so the quantile
    * interpolation sees bit-identical inputs in both engines (raw
    * margins carry ~1e-15 merge-order noise). Cost beyond the
    * heuristic gate: the bounded GD loop (Dims+1-row collects) + one
    * map-only scoring pass.
    */
  private def modelKeptIds(corpus: DataFrame): DataFrame = {
    val vec = Classifier.featurizeOn(corpus)
    val wts = Classifier.trainWeights(vec)
    val wl = array(wts.map(lit).toIndexedSeq: _*)
    val kept = vec
      .select(col("doc_id"),
        (floor(graft.functions.DotProduct.dotCol(col("x"), wl) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("score"))
      .join(corpus.select("doc_id", "lang"), "doc_id")
      .transform(perLangQuantileKeep(_, "score"))
      .stable // materialize before freeing the feature cache
    vec.unpersist(false)
    kept
  }

  /** DSIR gate: importance weights from [[Dsir.weightsOn]] over the
    * corpus being curated (target = its own `en` slice), floor-rounded
    * at 1e-6 BEFORE the per-lang p25 quantile (the model gate's
    * convention — raw weights carry ~1e-13 sum-order noise). Docs
    * with no tokenizable grams carry no weight and are dropped by the
    * inner join — the gate's contract, mirrored in the oracle. Third
    * scorer in the A/B family: heuristic composite, trained
    * classifier margin, and now distribution-matching importance.
    */
  private def dsirKeptIds(corpus: DataFrame): DataFrame =
    Dsir.weightsOn(corpus)
      .select(col("doc_id"),
        (floor(col("w") * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
      .join(corpus.select("doc_id", "lang"), "doc_id")
      .transform(perLangQuantileKeep(_, "score"))

  private def curateStages(s: SparkSession, d: String,
      edgeProducer: DataFrame => DataFrame,
      keptIdsOf: DataFrame => DataFrame = heuristicKeptIds): Stages =
    curateStagesOn(s, Tables.documents(s, d), edgeProducer, keptIdsOf)

  /** [[curateStages]] over any documents frame (the ScaleCurve tool
    * feeds replicated corpora). `edgeProducer` receives the stabled
    * `(doc_id, sh)` SHINGLE frame of the stage-1 survivors (not the
    * document frame) — see [[Dedup.ngramScoredFromShingles]] /
    * [[Dedup.minhashScoredFromShingles]].
    */
  private[graft] def curateStagesOn(s: SparkSession, docs: DataFrame,
      edgeProducer: DataFrame => DataFrame,
      keptIdsOf: DataFrame => DataFrame): Stages = {
    graft.functions.WordShingles.register(s)
    val corpus = docs.filter(col("doc_id") >= BenchCap)

    // stage 1 — per-lang p25 gate over the configured scorer
    val keptIds = keptIdsOf(corpus)
    // s1 feeds the edge producer, the census, AND the stage-3 shingle
    // scan — materialize it eagerly so the census union's parallel
    // branches all read the cache instead of racing to compute it
    val s1 = corpus.join(keptIds, "doc_id").stable
    // the s1 SHINGLE frame is shared by the edge producer and the
    // stage-3 decontamination scan — materialized once instead of two
    // word_shingles passes over s1/s2 (the DuckDB oracle shares its
    // `sh` CTE between pair generation and `contam` exactly the same
    // way, so the sharing is the spec, not a shortcut)
    val sh1 = s1
      .select(col("doc_id"), expr("word_shingles(text)").as("sh")).stable

    // stage 2 — near-dup keep (dedup_keep semantics over s1)
    val edges = edgeProducer(sh1)
    val clusters = Cluster.clustersOf(edges).stable // reused by the split
    val keepIds = s1.select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
      .select("doc_id")
    val s2 = s1.join(keepIds, "doc_id")

    // stage 3 — benchmark decontamination (decontaminate semantics):
    // drop survivors sharing ANY shingle with the held-out eval docs
    val bench = docs.filter(col("doc_id") < BenchCap)
      .select(explode(expr("word_shingles(text)")).as("shingle")).distinct()
    val contaminated = sh1.join(s2.select("doc_id"), "doc_id")
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .join(broadcast(bench), "shingle")
      .select("doc_id").distinct()
    val s3 = s2.select("doc_id").join(contaminated, Seq("doc_id"), "left_anti")

    // stage 4 — cluster-atomic split (split_leakfree semantics)
    val splits = s3
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), TextOps.splitLabel(TextOps.hashBucket(
        coalesce(col("cluster_id"), col("doc_id")))).as("split"))
    Stages(corpus, s1, sh1, clusters, s2, s3, splits)
  }

  private def cnt(stage: String, df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_docs")).select(lit(stage).as("stage"), col("n_docs"))

  /** Cross-entry stage-frame sharing ([[graft.core.ModelCache]], the
    * mf/item_cf trainer/serve protocol applied to the pipeline
    * matrix): the 12 registry entries form 6 (gate × edge) cells whose
    * curate and pretrain members run the SAME quality → dedup →
    * decontamination chain — self-contained-by-contract, so without
    * sharing each chain executes twice per session (~58 s of the
    * full-registry bench). Curate entries are the TRAINERS (always
    * rebuild, refresh the cell); pretrain entries reuse a warm cell
    * and otherwise build + warm it. Only ID-WIDTH artifacts are
    * cached — the 4-row stage census and the (doc_id, split) table —
    * never document text, so the cache holds digest-class rows (the
    * repo's shuffle philosophy applied to retention); both are
    * md5/integer-deterministic, so a warm pretrain emits
    * bit-identical census rows to a cold one (oracle unchanged).
    */
  private def cellKey(cell: String) = s"pipeline_stages_$cell"

  def pipelineCurateWith(s: SparkSession, d: String,
      edgeProducer: DataFrame => DataFrame,
      keptIdsOf: DataFrame => DataFrame = heuristicKeptIds,
      cell: Option[String] = None): DataFrame = {
    val st = curateStages(s, d, edgeProducer, keptIdsOf)
    val out = cnt("0_corpus", st.corpus)
      .unionAll(cnt("1_quality", st.s1))
      .unionAll(cnt("2_dedup", st.s2))
      .unionAll(cnt("3_decontam", st.s3))
      .unionAll(st.splits.groupBy("split")
        .agg(count(lit(1)).as("n_docs"))
        .select(concat(lit("4_"), col("split")).as("stage"), col("n_docs")))
      .stable // materialize before freeing the stage caches
    cell.foreach { c =>
      graft.core.ModelCache.put(s, d, cellKey(c),
        (out.filter(col("stage") < "4").stable, st.splits.stable))
    }
    st.s1.unpersist(false)
    st.sh1.unpersist(false)
    st.clusters.unpersist(false)
    out
  }

  /** The training-shard materialization pipeline — curate stages 0–4,
    * then TRAIN-split survivors only: per-source token-budget cap
    * (cap_source_tokens semantics, ingest order), context-window
    * chunking (chunk_text semantics), and deterministic md5 shard
    * assignment of the chunks. Census output: docs per curate stage,
    * capped docs, total chunks, chunks per shard — the artifact a
    * training job consumes. Same composition contract as
    * pipelineCurate: every stage is a separately-oracle-verified
    * operator and the whole chain sits under one DuckDB hash gate.
    *
    * Scale: the additions are one per-source window over the train
    * survivors (linear), the map+explode chunker, and a map-side md5
    * shard id — nothing beyond the curate chain's cost envelope.
    */
  def pipelinePretrainWith(s: SparkSession, d: String,
      edgeProducer: DataFrame => DataFrame,
      keptIdsOf: DataFrame => DataFrame = heuristicKeptIds,
      cell: Option[String] = None): DataFrame = {
    // warm cell (its curate twin — or an earlier rep of this entry —
    // already ran this session): reuse the census + split table and
    // run only the pretrain tail; the quality/dedup/decontam chain is
    // skipped entirely
    cell.flatMap(c => graft.core.ModelCache
        .get[(DataFrame, DataFrame)](s, d, cellKey(c))) match {
      case Some((census03, splits)) => pretrainTail(s, d, census03, splits)
      case None =>
        val st = curateStages(s, d, edgeProducer, keptIdsOf)
        val census03 = cnt("0_corpus", st.corpus)
          .unionAll(cnt("1_quality", st.s1))
          .unionAll(cnt("2_dedup", st.s2))
          .unionAll(cnt("3_decontam", st.s3))
          .stable
        val splits = st.splits.stable
        cell.foreach(c =>
          graft.core.ModelCache.put(s, d, cellKey(c), (census03, splits)))
        val out = pretrainTail(s, d, census03, splits)
        st.s1.unpersist(false)
        st.sh1.unpersist(false)
        st.clusters.unpersist(false)
        out
    }
  }

  /** Stages 5–7 over a materialized (doc_id, split) table plus the
    * curate census rows — the part of the pretrain pipeline that is
    * NOT shared with the curate twin.
    */
  private def pretrainTail(s: SparkSession, d: String,
      census03: DataFrame, splits: DataFrame): DataFrame = {
    val corpus = Tables.documents(s, d).filter(col("doc_id") >= BenchCap)
    val train = splits.filter(col("split") === "train").select("doc_id")

    // stage 5 — per-source token budget over train docs, ingest order
    // (ScalableRank grouped prefix sum — the cap_source_tokens shape:
    // never a per-source window partition)
    val s5 = graft.core.ScalableRank.groupedPrefixSums(
      corpus.join(train, "doc_id")
        .select(col("doc_id"), col("source"), col("text"),
          size(Dedup.tokensCol(col("text"))).cast("long").as("ntok")),
      "source", Seq("ntok"), Seq("cum"), col("doc_id").asc)
      .filter(col("cum") <= Curation.TokenBudget)
      .select(col("doc_id"), col("text"))
      .stable // census count + chunker both read it

    // stage 6 — context-window chunks of the capped train corpus
    val chunks = Curation.chunkTextOn(s5).stable // census + shard stage

    // stage 7 — deterministic shard assignment of the chunks
    val shards = chunks.select(
      pmod(conv(substring(md5(concat(lit("pshard:"),
          col("doc_id").cast("string"), lit(":"),
          col("chunk_id").cast("string"))), 1, 6), 16, 10).cast("long"),
        lit(Curation.NShards)).cast("int").as("shard"))

    val out = census03
      .unionAll(cnt("4_train", train))
      .unionAll(cnt("5_cap", s5))
      .unionAll(cnt("6_chunks", chunks))
      .unionAll(shards.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"))
        .select(concat(lit("7_shard_"), col("shard")).as("stage"), col("n_docs")))
      .stable
    s5.unpersist(false)
    chunks.unpersist(false)
    out
  }

  /** Registered oracle form of the pretrain pipeline (quadratic ngram
    * edges); [[pipelinePretrainMinhash]] is the linear scale path,
    * spec'd output-identical on sf0.001 (PipelineSpec).
    */
  def pipelinePretrain(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      cell = Some("heuristic_ngram"))

  def pipelinePretrainMinhash(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      cell = Some("heuristic_minhash"))

  /** The full stack: model-gated stage 1 + shard materialization — the
    * pipeline a production pretraining run ships. Oracle = the nested
    * GD chain + curate suffix + pretrain tail, all from the same
    * shared SQL segments.
    */
  def pipelinePretrainModel(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      modelKeptIds, cell = Some("model_ngram"))

  /** The model-gated pipeline: stage 1 ranks by the trained classifier
    * margin instead of the heuristic composite (same per-lang 75%
    * budget); stages 2–4 unchanged. Registered with the full oracle —
    * the unrolled GD chain nests inside the curate chain, so ONE
    * DuckDB hash gate certifies train → score → gate → dedup →
    * decontam → split end to end.
    */
  def pipelineCurateModel(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      modelKeptIds, cell = Some("model_ngram"))

  /** Linear-edge twin of [[pipelineCurateModel]] (MinHash+LSH), spec'd
    * output-identical on sf0.001 — the form that runs at 100 TB.
    */
  def pipelineCurateModelMinhash(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      modelKeptIds, cell = Some("model_minhash"))

  /** DSIR-gated curation (quadratic ngram oracle baseline). */
  def pipelineCurateDsir(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      dsirKeptIds, cell = Some("dsir_ngram"))

  /** DSIR-gated curation over the linear MinHash+LSH edge path — the
    * 100 TB form of the distribution-matched pipeline.
    */
  def pipelineCurateDsirMinhash(s: SparkSession, d: String): DataFrame =
    pipelineCurateWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      dsirKeptIds, cell = Some("dsir_minhash"))

  /** Remaining cells of the gate × edge × output matrix: the pretrain
    * shard pipeline under the model gate with linear MinHash edges,
    * and under the DSIR gate with both edge producers — every
    * (heuristic | model | dsir) × (ngram | minhash) × (curate |
    * pretrain) combination is now registered and oracle-gated.
    */
  def pipelinePretrainModelMinhash(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      modelKeptIds, cell = Some("model_minhash"))

  def pipelinePretrainDsir(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.ngramScoredFromShingles(sh)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      dsirKeptIds, cell = Some("dsir_ngram"))

  def pipelinePretrainDsirMinhash(s: SparkSession, d: String): DataFrame =
    pipelinePretrainWith(s, d,
      sh => Dedup.minhashScoredFromShingles(sh, 0.6)
        .filter(col("jac") >= 0.6).select(col("doc_a"), col("doc_b")),
      dsirKeptIds, cell = Some("dsir_minhash"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pretrain_model_minhash" -> pipelinePretrainModelMinhash,
    "pipeline_pretrain_dsir" -> pipelinePretrainDsir,
    "pipeline_pretrain_dsir_minhash" -> pipelinePretrainDsirMinhash,
    "pipeline_curate_dsir" -> pipelineCurateDsir,
    "pipeline_curate_dsir_minhash" -> pipelineCurateDsirMinhash,
    "pipeline_curate" -> pipelineCurate,
    "pipeline_curate_minhash" -> pipelineCurateMinhash,
    "pipeline_curate_model" -> pipelineCurateModel,
    "pipeline_curate_model_minhash" -> pipelineCurateModelMinhash,
    "pipeline_pretrain" -> pipelinePretrain,
    "pipeline_pretrain_minhash" -> pipelinePretrainMinhash,
    "pipeline_pretrain_model" -> pipelinePretrainModel)

  private val tokSqlDuck =
    "list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0)"

  // Shared curate-chain CTEs embedded by every pipeline oracle — one
  // definition per segment so the composed gates can never drift
  // apart. The chain is prefix (t0) + a stage-1 variant (heuristic
  // p25 gate, or the nested classifier-GD chain scoring the same 75%
  // budget) + the common suffix (dedup → decontam → split).
  private val chainPrefixSql =
    s"""t0 AS (SELECT doc_id, lang, text FROM documents WHERE doc_id >= 20)""".stripMargin

  private val s1HeuristicSql =
    s"""qt AS (SELECT doc_id, lang, text, $tokSqlDuck AS ws FROM t0),
         |q AS (SELECT doc_id, lang, text,
         |  floor(((CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE) / len(ws)) * 0.4
         |    + least(len(ws) / 100.0, 1.0) * 0.3
         |    + (1.0 - CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE) / length(text)) * 0.3) * 10000 + 0.5) / 10000.0 AS quality
         |  FROM qt),
         |thr AS (SELECT lang, quantile_cont(quality, 0.25) AS thr FROM q GROUP BY lang),
         |s1 AS (SELECT q.doc_id, q.lang, q.text FROM q JOIN thr USING (lang)
         |       WHERE quality >= thr)""".stripMargin

  // Classifier GD chain over t0 (names f0/f1/dd/n0/w0/m_i/g_i/w_i —
  // disjoint from the curate chain's), then margin-scored per-lang p25
  // gate. Margins floor-rounded at 1e-6 BEFORE the quantile, exactly
  // like the Spark side, so interpolation sees identical inputs.
  private def s1ModelSql =
    s"""${Classifier.chainSqlOn("t0")},
         |smod AS (SELECT d.doc_id, floor(sum(d.x * w.w) * 1e6 + 0.5) / 1e6 AS score
         |         FROM dd d JOIN ${Classifier.finalWeightsCte} w USING (dim)
         |         GROUP BY d.doc_id),
         |sml AS (SELECT t0.doc_id, t0.lang, t0.text, smod.score
         |        FROM t0 JOIN smod USING (doc_id)),
         |mthr AS (SELECT lang, quantile_cont(score, 0.25) AS thr
         |         FROM sml GROUP BY lang),
         |s1 AS (SELECT sml.doc_id, sml.lang, sml.text FROM sml
         |       JOIN mthr USING (lang) WHERE score >= thr)""".stripMargin

  // DSIR importance gate over t0 (Dsir.weightsSqlOver's d-prefixed
  // chain, ending in dwt), weights floor-rounded at 1e-6 before the
  // per-lang p25 quantile exactly like the Spark side. Gram-less docs
  // drop at the inner join, matching dsirKeptIds' contract.
  private def s1DsirSql =
    s"""${Dsir.weightsSqlOver("t0")},
       |dsl AS (SELECT t0.doc_id, t0.lang, t0.text,
       |          floor(dwt.w * 1e6 + 0.5) / 1e6 AS score
       |        FROM t0 JOIN dwt USING (doc_id)),
       |dthr AS (SELECT lang, quantile_cont(score, 0.25) AS thr
       |         FROM dsl GROUP BY lang),
       |s1 AS (SELECT dsl.doc_id, dsl.lang, dsl.text FROM dsl
       |       JOIN dthr USING (lang) WHERE score >= thr)""".stripMargin

  private val chainSuffixSql =
    s"""sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |      generate_series(1, len(w) - 2),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         |    ELSE [] END AS shingles
         |  FROM (SELECT doc_id, $tokSqlDuck AS w FROM s1)),
         |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |ok AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) <= 128),
         |exf AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN ok USING (shingle)),
         |sizes AS (SELECT doc_id, len(shingles) AS nsh FROM sh),
         |pairs AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
         |  FROM exf x JOIN exf y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT doc_a, doc_b
         |  FROM pairs
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.6),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM scored
         |      UNION ALL
         |      SELECT doc_b AS src, doc_a AS dst FROM scored),
         |cc AS (
         |  SELECT DISTINCT src AS node, src AS label FROM e
         |  UNION
         |  SELECT e.dst AS node, cc.label FROM cc JOIN e ON e.src = cc.node),
         |lab AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node),
         |s2 AS (SELECT s1.doc_id, s1.lang, s1.text FROM s1
         |       LEFT JOIN lab ON lab.node = s1.doc_id
         |       WHERE lab.cluster_id IS NULL OR lab.cluster_id = s1.doc_id),
         |bsh AS (
         |  SELECT DISTINCT unnest(shingles) AS shingle FROM (
         |    SELECT CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |        generate_series(1, len(w) - 2),
         |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         |      ELSE [] END AS shingles
         |    FROM (SELECT $tokSqlDuck AS w FROM documents WHERE doc_id < 20))),
         |contam AS (
         |  SELECT DISTINCT ex2.doc_id FROM (
         |    SELECT s2.doc_id, unnest(sh.shingles) AS shingle
         |    FROM s2 JOIN sh ON sh.doc_id = s2.doc_id) ex2
         |  JOIN bsh USING (shingle)),
         |s3 AS (SELECT doc_id FROM s2
         |       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |keyed AS (
         |  SELECT s3.doc_id, coalesce(lab.cluster_id, s3.doc_id) AS k
         |  FROM s3 LEFT JOIN lab ON lab.node = s3.doc_id),
         |splits AS (
         |  SELECT doc_id,
         |    CASE WHEN (k % 1000003) * 2654435761 % 100 < 90 THEN 'train'
         |         WHEN (k % 1000003) * 2654435761 % 100 < 95 THEN 'validation'
         |         ELSE 'test' END AS split
         |  FROM keyed)""".stripMargin

  private val chainSql =
    s"$chainPrefixSql,\n$s1HeuristicSql,\n$chainSuffixSql"

  private def modelChainSql =
    s"$chainPrefixSql,\n$s1ModelSql,\n$chainSuffixSql"

  // The post-edge tail of chainSuffixSql (dedup keep → decontam →
  // split), shared verbatim by the minhash-edged chain below — only
  // the producer of `scored(doc_a, doc_b)` differs between the
  // quadratic oracle baseline and the linear MinHash path.
  private val ccSplitTailSql =
    s"""e AS (SELECT doc_a AS src, doc_b AS dst FROM scored
         |      UNION ALL
         |      SELECT doc_b AS src, doc_a AS dst FROM scored),
         |cc AS (
         |  SELECT DISTINCT src AS node, src AS label FROM e
         |  UNION
         |  SELECT e.dst AS node, cc.label FROM cc JOIN e ON e.src = cc.node),
         |lab AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node),
         |s2 AS (SELECT s1.doc_id, s1.lang, s1.text FROM s1
         |       LEFT JOIN lab ON lab.node = s1.doc_id
         |       WHERE lab.cluster_id IS NULL OR lab.cluster_id = s1.doc_id),
         |bsh AS (
         |  SELECT DISTINCT unnest(shingles) AS shingle FROM (
         |    SELECT CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |        generate_series(1, len(w) - 2),
         |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         |      ELSE [] END AS shingles
         |    FROM (SELECT $tokSqlDuck AS w FROM documents WHERE doc_id < 20))),
         |contam AS (
         |  SELECT DISTINCT ex2.doc_id FROM (
         |    SELECT s2.doc_id, unnest(sh.shingles) AS shingle
         |    FROM s2 JOIN sh ON sh.doc_id = s2.doc_id) ex2
         |  JOIN bsh USING (shingle)),
         |s3 AS (SELECT doc_id FROM s2
         |       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |keyed AS (
         |  SELECT s3.doc_id, coalesce(lab.cluster_id, s3.doc_id) AS k
         |  FROM s3 LEFT JOIN lab ON lab.node = s3.doc_id),
         |splits AS (
         |  SELECT doc_id,
         |    CASE WHEN (k % 1000003) * 2654435761 % 100 < 90 THEN 'train'
         |         WHEN (k % 1000003) * 2654435761 % 100 < 95 THEN 'validation'
         |         ELSE 'test' END AS split
         |  FROM keyed)""".stripMargin

  // MinHash-edged suffix: same sh/keep/decontam/split chain, edges
  // from the md5/mod-P signature pipeline (Dedup fragments reproduce
  // minhashScored bit-for-bit — see Dedup.minhashBucketsSql). Composed
  // by concatenation, never nested stripMargin.
  private def chainSuffixMinhashSql: String =
    Dedup.shSqlOver("s1") + ",\n" + Dedup.minhashBucketsSql + ",\n" +
      Dedup.minhashScoredSql(Some(0.6)) + ",\n" + ccSplitTailSql

  private def minhashChainSql =
    s"$chainPrefixSql,\n$s1HeuristicSql,\n$chainSuffixMinhashSql"

  private def modelMinhashChainSql =
    s"$chainPrefixSql,\n$s1ModelSql,\n$chainSuffixMinhashSql"

  private def dsirChainSql =
    s"$chainPrefixSql,\n$s1DsirSql,\n$chainSuffixSql"

  private def dsirMinhashChainSql =
    s"$chainPrefixSql,\n$s1DsirSql,\n$chainSuffixMinhashSql"

  private val censusSql =
    """SELECT '0_corpus' AS stage, count(*) AS n_docs FROM t0
      |UNION ALL SELECT '1_quality', count(*) FROM s1
      |UNION ALL SELECT '2_dedup', count(*) FROM s2
      |UNION ALL SELECT '3_decontam', count(*) FROM s3
      |UNION ALL SELECT '4_' || split, count(*) FROM splits GROUP BY split""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "pipeline_pretrain_model_minhash" ->
      ("WITH RECURSIVE\n" + modelMinhashChainSql + ",\n" + pretrainTailSql +
        "\n" + pretrainCensusSql),
    "pipeline_pretrain_dsir" ->
      ("WITH RECURSIVE\n" + dsirChainSql + ",\n" + pretrainTailSql +
        "\n" + pretrainCensusSql),
    "pipeline_pretrain_dsir_minhash" ->
      ("WITH RECURSIVE\n" + dsirMinhashChainSql + ",\n" + pretrainTailSql +
        "\n" + pretrainCensusSql),
    "pipeline_curate_dsir" ->
      ("WITH RECURSIVE\n" + dsirChainSql + "\n" + censusSql),
    "pipeline_curate_dsir_minhash" ->
      ("WITH RECURSIVE\n" + dsirMinhashChainSql + "\n" + censusSql),
    "pipeline_curate_minhash" ->
      ("WITH RECURSIVE\n" + minhashChainSql + "\n" + censusSql),
    "pipeline_curate_model_minhash" ->
      ("WITH RECURSIVE\n" + modelMinhashChainSql + "\n" + censusSql),
    "pipeline_pretrain_minhash" ->
      ("WITH RECURSIVE\n" + minhashChainSql + ",\n" + pretrainTailSql +
        "\n" + pretrainCensusSql),
    "pipeline_curate" ->
      s"""WITH RECURSIVE
         |$chainSql
         |$censusSql""".stripMargin,
    "pipeline_curate_model" ->
      s"""WITH RECURSIVE
         |$modelChainSql
         |$censusSql""".stripMargin,
    "pipeline_pretrain" ->
      s"""WITH RECURSIVE
         |$chainSql,
         |$pretrainTailSql
         |$pretrainCensusSql""".stripMargin,
    "pipeline_pretrain_model" ->
      s"""WITH RECURSIVE
         |$modelChainSql,
         |$pretrainTailSql
         |$pretrainCensusSql""".stripMargin)

  private val pretrainTailSql =
    s"""tr AS (SELECT doc_id FROM splits WHERE split = 'train'),
         |capt AS (SELECT d.doc_id, d.source, d.text,
         |           CAST(len(list_filter(string_split_regex(d.text, '[^\\p{L}]+'),
         |                                x -> len(x) > 0)) AS BIGINT) AS ntok
         |         FROM documents d JOIN tr USING (doc_id)),
         |s5 AS (SELECT doc_id, text FROM (
         |         SELECT doc_id, text,
         |           sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
         |                           ROWS UNBOUNDED PRECEDING) AS cum
         |         FROM capt)
         |       WHERE cum <= ${Curation.TokenBudget}),
         |cws AS (SELECT doc_id,
         |          list_filter(string_split_regex(text, '\\s+'),
         |                      x -> len(x) > 0) AS ws
         |        FROM s5),
         |cn AS (SELECT doc_id, len(ws) AS n FROM cws WHERE len(ws) > 0),
         |chid AS (SELECT doc_id,
         |           CAST(unnest(generate_series(0, n - 1, ${Curation.ChunkStride}))
         |                // ${Curation.ChunkStride} AS INTEGER) AS chunk_id
         |         FROM cn),
         |shards AS (SELECT CAST(('0x' || substr(md5('pshard:' ||
         |             CAST(doc_id AS VARCHAR) || ':' ||
         |             CAST(chunk_id AS VARCHAR)), 1, 6))::UBIGINT
         |             % ${Curation.NShards} AS INTEGER) AS shard
         |           FROM chid)""".stripMargin
  // NOTE: this val is embedded into outer stripMargin templates, so no
  // line above may BEGIN with '|' (e.g. a wrapped '||' concat) — the
  // outer stripMargin would eat one pipe and break the SQL.

  private val pretrainCensusSql =
    """SELECT '0_corpus' AS stage, count(*) AS n_docs FROM t0
      |UNION ALL SELECT '1_quality', count(*) FROM s1
      |UNION ALL SELECT '2_dedup', count(*) FROM s2
      |UNION ALL SELECT '3_decontam', count(*) FROM s3
      |UNION ALL SELECT '4_train', count(*) FROM tr
      |UNION ALL SELECT '5_cap', count(*) FROM s5
      |UNION ALL SELECT '6_chunks', count(*) FROM chid
      |UNION ALL SELECT '7_shard_' || shard, count(*) FROM shards GROUP BY shard""".stripMargin
}
