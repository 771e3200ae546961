package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Token-distribution entropy per source [EXT] — the corpus-health
  * number next to [[TextOps]]' vocab/quality censuses: low unigram
  * entropy flags templated or repetitive sources (the weak-diversity
  * signal that survives exact dedup), high entropy flags token salad.
  * H = −Σ p_w ln p_w over the source's token distribution, each term
  * nano-quantized BEFORE the sum (the MI/chi² integer-aggregate
  * rule), so the per-source fold is merge-order free.
  *
  * Scale shape: one tokenize pass → (source, token) hash agg →
  * vocab-bounded term frame → integer sum. Nothing scales beyond
  * the vocabulary.
  */
object Entropy {

  def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("nw"))
    val tot = cnt.groupBy("source").agg(sum("nw").as("n_tokens"),
      count(lit(1)).as("vocab"))
    cnt.join(broadcast(tot), "source")
      .select(col("source"), col("n_tokens"), col("vocab"),
        floor((col("nw").cast("double") / col("n_tokens"))
          * log(col("n_tokens").cast("double") / col("nw"))
          * 1e9 + lit(0.5)).cast("long").as("term_nano"))
      .groupBy("source", "n_tokens", "vocab")
      .agg(sum("term_nano").as("entropy_nano"))
  }

  /** Pairwise Jensen-Shannon divergence between source token
    * distributions [EXT] — the corpus-governance "which sources are
    * the same distribution" matrix (mirror sites, templated farms,
    * re-crawls) that complements document-level dedup: JS ≈ 0 flags a
    * REDUNDANT SOURCE even when no individual document is a
    * duplicate. Computed via the entropy identity JS(p,q) =
    * H((p+q)/2) − ½H(p) − ½H(q), which turns the union-of-vocab
    * problem into a UNION ALL + re-aggregate (each side contributes
    * its half-probability rows per pair; tokens absent from one side
    * simply contribute nothing) — no outer join, every join equi
    * except the |sources|² pair frame itself (a dimension×dimension
    * product, corpus-size-free). Each −m·ln m term nano-quantizes
    * BEFORE its sum; the final subtraction is integer (the ½-leg uses
    * DIV 2, a documented ≤1-nano floor).
    *
    * Scale shape: one tokenize pass → (source, token) hash agg →
    * vocab-bounded frames fan out over S−1 pairs per source (S =
    * |sources|, an enum) → integer folds per pair. Nothing scales
    * beyond vocab × S².
    */
  def sourceDivergenceJs(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("nw"))
    val tot = cnt.groupBy("source").agg(sum("nw").as("n_tokens"))
    // per-source entropy legs, nano-quantized per term (tokenEntropy's
    // exact chain, sans the vocab column)
    val hLeg = cnt.join(broadcast(tot), "source")
      .select(col("source"),
        floor((col("nw").cast("double") / col("n_tokens"))
          * log(col("n_tokens").cast("double") / col("nw"))
          * 1e9 + lit(0.5)).cast("long").as("term_nano"))
      .groupBy("source").agg(sum("term_nano").as("h_nano"))
    // ordered source pairs (dimension × dimension, S² rows)
    val pairs = tot.select(col("source").as("source_a"))
      .crossJoin(broadcast(tot.select(col("source").as("source_b"))))
      .filter(col("source_a") < col("source_b"))
    // half-probability contributions: side a then side b, re-aggregated
    val probs = cnt.join(broadcast(tot), "source")
      .select(col("source"),
        col("w"), (col("nw").cast("double") / col("n_tokens") / 2).as("p_half"))
    val mixA = pairs.join(probs, col("source_a") === col("source"))
      .select(col("source_a"), col("source_b"), col("w"), col("p_half"))
    val mixB = pairs.join(probs, col("source_b") === col("source"))
      .select(col("source_a"), col("source_b"), col("w"), col("p_half"))
    val hm = mixA.unionAll(mixB)
      .groupBy("source_a", "source_b", "w")
      .agg(sum("p_half").as("m"))
      .select(col("source_a"), col("source_b"),
        floor(col("m") * log(lit(1.0) / col("m")) * 1e9 + lit(0.5))
          .cast("long").as("term_nano"))
      .groupBy("source_a", "source_b").agg(sum("term_nano").as("hm_nano"))
    hm.join(broadcast(hLeg.withColumnRenamed("source", "source_a")
          .withColumnRenamed("h_nano", "hp_nano")), "source_a")
      .join(broadcast(hLeg.withColumnRenamed("source", "source_b")
          .withColumnRenamed("h_nano", "hq_nano")), "source_b")
      .select(col("source_a"), col("source_b"), col("hm_nano"),
        col("hp_nano"), col("hq_nano"),
        expr("hm_nano - (hp_nano + hq_nano) DIV 2").as("js_nano"))
  }

  /** Cross-source perplexity matrix [EXT] — the ASYMMETRIC companion
    * to [[sourceDivergenceJs]]: an add-1-smoothed unigram LM trained
    * on each source scores every source's tokens (the CCNet/DSIR-style
    * domain-affinity read: "how surprised is a model of A by B?").
    * The diagonal is the in-domain baseline; a row that scores one
    * foreign source nearly as low flags domain overlap.
    *
    * nll per matched token w: ln((N_t + V_t)/(c_t + 1)); per OOV
    * token: ln(N_t + V_t). Per-(pair, w) terms nano-quantize BEFORE
    * the integer sum; the OOV leg is one quantized scalar times an
    * exact instance count (identical-term multiplication is exact in
    * int64). avg_nll is an integer DIV.
    *
    * Scale shape: the matched join is (token) equi over two
    * vocab-bounded frames (vocab × S² worst case); totals are S-row
    * broadcasts; the only non-equi node is the S × S pair frame.
    * Nothing scales beyond vocab × S².
    */
  def lmCrossPpl(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("vocab"))
    val train = cnt.select(col("source").as("source_train"), col("w"),
        col("c").as("c_t"))
      .join(broadcast(tot.select(col("source").as("source_train"),
        (col("n_tok") + col("vocab")).as("denom_t"))), "source_train")
    val eval_ = cnt.select(col("source").as("source_eval"), col("w"),
      col("c").as("c_e"))
    val matched = eval_.join(train, "w")
      .select(col("source_train"), col("source_eval"), col("c_e"),
        floor(col("c_e") * log(col("denom_t").cast("double") / (col("c_t") + 1))
          * 1e9 + lit(0.5)).cast("long").as("term_nano"))
      .groupBy("source_train", "source_eval")
      .agg(sum("term_nano").as("matched_nano"), sum("c_e").as("matched_inst"))
    val pairs = tot.select(col("source").as("source_train"),
        (col("n_tok") + col("vocab")).as("denom_t"))
      .crossJoin(broadcast(tot.select(col("source").as("source_eval"),
        col("n_tok").as("n_eval"))))
    pairs.join(matched, Seq("source_train", "source_eval"), "left")
      .select(col("source_train"), col("source_eval"), col("n_eval"),
        (col("n_eval") - coalesce(col("matched_inst"), lit(0L))).as("oov_inst"),
        (coalesce(col("matched_nano"), lit(0L))
          + (col("n_eval") - coalesce(col("matched_inst"), lit(0L)))
            * floor(log(col("denom_t").cast("double")) * 1e9 + lit(0.5))
              .cast("long")).as("nll_nano"))
      .withColumn("avg_nll_nano", expr("nll_nano DIV n_eval"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_entropy" -> tokenEntropy,
    "source_divergence_js" -> sourceDivergenceJs,
    "lm_cross_ppl" -> lmCrossPpl)

  def oracleSql: Map[String, String] = Map(
    "token_entropy" ->
      """WITH cnt AS (
        |  SELECT source, w, count(*) AS nw
        |  FROM (SELECT source,
        |          unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                             x -> len(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |tot AS (SELECT source, CAST(sum(nw) AS BIGINT) AS n_tokens,
        |          count(*) AS vocab
        |        FROM cnt GROUP BY source)
        |SELECT c.source, t.n_tokens, t.vocab,
        |  CAST(sum(CAST(floor((CAST(nw AS DOUBLE) / t.n_tokens)
        |    * ln(CAST(t.n_tokens AS DOUBLE) / nw) * 1e9 + 0.5) AS BIGINT))
        |    AS BIGINT) AS entropy_nano
        |FROM cnt c JOIN tot t USING (source)
        |GROUP BY c.source, t.n_tokens, t.vocab""".stripMargin,
    "source_divergence_js" ->
      """WITH cnt AS (
        |  SELECT source, w, count(*) AS nw
        |  FROM (SELECT source,
        |          unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                             x -> len(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |tot AS (SELECT source, CAST(sum(nw) AS BIGINT) AS n_tokens
        |        FROM cnt GROUP BY source),
        |h_leg AS (
        |  SELECT c.source,
        |    CAST(sum(CAST(floor((CAST(nw AS DOUBLE) / t.n_tokens)
        |      * ln(CAST(t.n_tokens AS DOUBLE) / nw) * 1e9 + 0.5) AS BIGINT))
        |      AS BIGINT) AS h_nano
        |  FROM cnt c JOIN tot t USING (source) GROUP BY c.source),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |probs AS (
        |  SELECT c.source, c.w,
        |    CAST(nw AS DOUBLE) / t.n_tokens / 2 AS p_half
        |  FROM cnt c JOIN tot t USING (source)),
        |mix AS (
        |  SELECT source_a, source_b, w, p_half
        |  FROM pairs JOIN probs ON source_a = probs.source
        |  UNION ALL
        |  SELECT source_a, source_b, w, p_half
        |  FROM pairs JOIN probs ON source_b = probs.source),
        |hm AS (
        |  SELECT source_a, source_b,
        |    CAST(sum(CAST(floor(m * ln(1.0 / m) * 1e9 + 0.5) AS BIGINT))
        |      AS BIGINT) AS hm_nano
        |  FROM (SELECT source_a, source_b, w, sum(p_half) AS m
        |        FROM mix GROUP BY source_a, source_b, w)
        |  GROUP BY source_a, source_b)
        |SELECT source_a, source_b, hm_nano,
        |  pa.h_nano AS hp_nano, pb.h_nano AS hq_nano,
        |  hm_nano - (pa.h_nano + pb.h_nano) // 2 AS js_nano
        |FROM hm
        |JOIN h_leg pa ON pa.source = source_a
        |JOIN h_leg pb ON pb.source = source_b""".stripMargin,
    "lm_cross_ppl" ->
      """WITH cnt AS (
        |  SELECT source, w, count(*) AS c
        |  FROM (SELECT source,
        |          unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                             x -> len(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
        |          count(*) AS vocab FROM cnt GROUP BY source),
        |matched AS (
        |  SELECT t.source AS source_train, e.source AS source_eval,
        |    CAST(sum(CAST(floor(e.c * ln(CAST(tt.n_tok + tt.vocab AS DOUBLE)
        |      / (t.c + 1)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS matched_nano,
        |    CAST(sum(e.c) AS BIGINT) AS matched_inst
        |  FROM cnt e
        |  JOIN cnt t ON e.w = t.w
        |  JOIN tot tt ON tt.source = t.source
        |  GROUP BY t.source, e.source),
        |pairs AS (
        |  SELECT a.source AS source_train,
        |    CAST(a.n_tok + a.vocab AS BIGINT) AS denom_t,
        |    b.source AS source_eval, b.n_tok AS n_eval
        |  FROM tot a, tot b)
        |SELECT source_train, source_eval, n_eval,
        |  CAST(n_eval - coalesce(matched_inst, 0) AS BIGINT) AS oov_inst,
        |  CAST(coalesce(matched_nano, 0)
        |    + (n_eval - coalesce(matched_inst, 0))
        |      * CAST(floor(ln(CAST(denom_t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    AS BIGINT) AS nll_nano,
        |  CAST((coalesce(matched_nano, 0)
        |    + (n_eval - coalesce(matched_inst, 0))
        |      * CAST(floor(ln(CAST(denom_t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
        |    // n_eval AS BIGINT) AS avg_nll_nano
        |FROM pairs LEFT JOIN matched USING (source_train, source_eval)""".stripMargin)
}
