package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") —
  * the bag-of-hashed-n-grams importance estimator the big pretraining
  * corpora use to tilt a raw crawl toward a target domain ([EXT], no
  * reference citation by definition — SURVEY.md §0).
  *
  * Model: unigram+bigram features hashed into [[NumBuckets]] buckets;
  * two multinomial distributions are fit with add-one smoothing — the
  * TARGET (here: the `lang = 'en'` slice, standing in for the curated
  * reference corpus) and the RAW pool (all documents). Each document's
  * importance weight is its log-likelihood ratio
  * `Σ_grams [ln p_target(b(g)) − ln p_raw(b(g))]`, and selection is
  * Gumbel-top-k on those weights — i.e. sampling WITHOUT replacement
  * proportional to softmax(weight), the paper's resampling step, with
  * the Gumbel noise derived deterministically from md5 so both engines
  * draw identical "randomness" (the repo's sampleWeighted trick).
  *
  * Scale design: the n-gram stream is one explode (linear in tokens);
  * both distributions partial-agg down to NumBuckets rows in ONE
  * shuffle (count + conditional count share the pass); λ is a
  * NumBuckets-row broadcast; scoring is a broadcast join + one
  * partial-agg'd groupBy(doc_id) — text never shuffles, and every
  * shuffled row is (id, bucket)/(id, partial-sum) narrow. Selection is
  * TakeOrdered top-k (no global sort materialization). All of it
  * survives 100 TB: the only state that grows with the corpus is the
  * token stream itself, which is map-reduced in a single pass.
  */
object Dsir {

  /** Hashed-feature bucket count. Real DSIR uses 10⁴–10⁵; 128 keeps
    * the oracle CTE tractable while exercising the identical plan.
    */
  val NumBuckets = 128

  /** Gumbel-top-k sample size. */
  val SampleK = 100

  private def toks(text: Column): Column = Dedup.tokensCol(text)

  private def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0

  /** First 48 md5 bits of the gram, mod [[NumBuckets]] — the same
    * md5-derived integer hash family as MinHash/CMS (exact in both
    * engines; 48 bits < 2^53 so the long is precise).
    */
  private def bucket(g: Column): Column =
    conv(substring(md5(g), 1, 12), 16, 10).cast("long") % NumBuckets

  /** Unigram + adjacent-bigram gram stream of a token-array ATTRIBUTE.
    * The bigrams come from `zip_with` over two SLICES of ws — not the
    * `transform(sequence, i -> element_at(ws, i))` indexing form:
    * under a Generate (explode) the indexed lambda measured ~10×
    * slower at sf0.1 (6–7 s vs 0.7 s for the identical 536k-gram
    * output; see tools/ProfileDsir), while the slice+zip kernel walks
    * both arrays linearly.
    */
  private def grams(ws: Column): Column =
    concat(ws,
      when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")))

  /** Exploded (doc_id, lang, bucket) stream — shared by both queries.
    * Tokenizes into an attribute FIRST (see [[grams]]).
    */
  private def bucketStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), toks(col("text")).as("ws"))
      .select(col("doc_id"), col("lang"), grams(col("ws")).as("gs"))
      .select(col("doc_id"), col("lang"), explode(col("gs")).as("g"))
      .select(col("doc_id"), col("lang"), bucket(col("g")).as("b"))

  /** λ table: NumBuckets rows of per-bucket log-likelihood ratios,
    * from one shared aggregation pass over the per-(doc, bucket)
    * count frame (raw count + target count).
    */
  private def lambdaTable(bc: DataFrame): DataFrame = {
    val cnt = bc.groupBy("b").agg(
      sum("nb").as("cr"),
      sum(when(col("lang") === "en", col("nb")).otherwise(0L)).as("ct"))
    val tot = cnt.agg(
      sum("cr").cast("long").as("totr"), sum("ct").cast("long").as("tott"))
    cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        (log(col("ct").cast("double") + 1.0) - log(col("tott").cast("double") + NumBuckets)
          - log(col("cr").cast("double") + 1.0) + log(col("totr").cast("double") + NumBuckets))
          .as("lam"))
  }

  /** Per-document importance weight (unrounded — [[dsirSample]] keys
    * off the raw double; the registered query rounds for the gate).
    * The gram stream collapses to per-(doc, bucket) COUNTS first —
    * ≤ NumBuckets rows per doc regardless of length — and that small
    * frame (checkpointed once, so tokenize+md5 runs a single pass)
    * feeds BOTH the distribution build and the scoring join; the
    * per-doc weight is Σ n_b·λ_b, a short fixed-order sum. Takes any
    * (doc_id, lang, text) frame so composed pipelines
    * (Pipeline.pipelineCurateDsir) can run the estimator over their
    * own corpus stage.
    */
  def weightsOn(docs: DataFrame): DataFrame = {
    val bc = bucketStream(docs)
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("nb"))
      .stable
    val out = bc.join(broadcast(lambdaTable(bc)), "b")
      .groupBy("doc_id")
      .agg(sum("nb").as("n_grams"), sum(col("nb") * col("lam")).as("w"))
      .stable
    bc.unpersist(false)
    out
  }

  /** Registered form: every document's gram count and importance
    * weight. Positive = looks like the target slice, negative = looks
    * like the rest of the pool.
    */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    weightsOn(Tables.documents(s, d))
      .select(col("doc_id"), col("n_grams"), r4(col("w")).as("dsir_w"))

  /** Gumbel-top-k resampling: key = w − ln(−ln(u)) with u the md5
    * uniform of the doc id — equivalent to drawing [[SampleK]] docs
    * without replacement with probability ∝ exp(w). TakeOrdered
    * top-k; the rank window runs on the k-row result only.
    */
  def dsirSample(s: SparkSession, d: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("dsir"), col("doc_id").cast("string"))), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(281474976710656.0)
    val keyed = weightsOn(Tables.documents(s, d))
      .select(col("doc_id"), (col("w") - log(-log(u))).as("gk"))
      .orderBy(col("gk").desc, col("doc_id"))
      .limit(SampleK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("gk").desc, col("doc_id"))
    keyed
      .withColumn("rk", row_number().over(w).cast("int"))
      .select(col("doc_id"), r4(col("gk")).as("gumbel_key"), col("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_weights" -> dsirWeights,
    "dsir_sample" -> dsirSample)

  private val tokSqlDuck =
    "list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0)"

  // Shared CTE chain over an arbitrary (doc_id, lang, text) relation:
  // gram stream → buckets → per-bucket counts → λ → per-doc weights,
  // ending in `dwt(doc_id, n_grams, w)`. CTE names are d-prefixed so
  // the chain composes into the Pipeline oracles without collisions.
  // Mirrors the Spark plan stage for stage; the only float surface is
  // the per-doc sum of ≤ NumBuckets-distinct λ terms, ~1e-13 noise
  // under the 1e-4 half-up rounding (lm_score precedent).
  private[queries] def weightsSqlOver(rel: String): String =
    s"""dw AS (SELECT doc_id, lang, $tokSqlDuck AS ws FROM $rel),
       |dg AS (SELECT doc_id, lang,
       |        list_concat(ws,
       |          CASE WHEN len(ws) >= 2 THEN list_transform(
       |            generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])
       |          ELSE [] END) AS gs
       |      FROM dw),
       |dex AS (SELECT doc_id, lang,
       |         CAST(('0x' || substr(md5(unnest(gs)), 1, 12))::UBIGINT % $NumBuckets AS BIGINT) AS b
       |       FROM dg),
       |dbc AS (SELECT doc_id, lang, b, count(*) AS nb
       |        FROM dex GROUP BY 1, 2, 3),
       |dcnt AS (SELECT b, sum(nb) AS cr,
       |          sum(CASE WHEN lang = 'en' THEN nb ELSE 0 END) AS ct
       |        FROM dbc GROUP BY 1),
       |dtot AS (SELECT CAST(sum(cr) AS BIGINT) AS totr,
       |               CAST(sum(ct) AS BIGINT) AS tott FROM dcnt),
       |dlam AS (SELECT b,
       |          ln(CAST(ct AS DOUBLE) + 1.0) - ln(CAST(tott AS DOUBLE) + $NumBuckets)
       |          - ln(CAST(cr AS DOUBLE) + 1.0) + ln(CAST(totr AS DOUBLE) + $NumBuckets) AS lam
       |        FROM dcnt CROSS JOIN dtot),
       |dwt AS (SELECT doc_id, CAST(sum(nb) AS BIGINT) AS n_grams,
       |          sum(nb * lam) AS w
       |       FROM dbc JOIN dlam USING (b) GROUP BY doc_id)""".stripMargin

  private def weightsSqlDuck: String = weightsSqlOver("documents")

  def oracleSql: Map[String, String] = Map(
    "dsir_weights" ->
      s"""WITH $weightsSqlDuck
         |SELECT doc_id, n_grams,
         |  floor(w * 10000 + 0.5) / 10000.0 AS dsir_w
         |FROM dwt""".stripMargin,
    "dsir_sample" ->
      s"""WITH $weightsSqlDuck,
         |keyed AS (
         |  SELECT doc_id,
         |    w - ln(-ln((CAST(('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT AS DOUBLE) + 0.5)
         |                / 281474976710656.0)) AS gk
         |  FROM dwt),
         |topk AS (SELECT doc_id, gk FROM keyed ORDER BY gk DESC, doc_id LIMIT $SampleK)
         |SELECT doc_id,
         |  floor(gk * 10000 + 0.5) / 10000.0 AS gumbel_key,
         |  CAST(row_number() OVER (ORDER BY gk DESC, doc_id) AS INTEGER) AS rk
         |FROM topk""".stripMargin)
}
