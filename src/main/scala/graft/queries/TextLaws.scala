package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Corpus statistical-law diagnostics [EXT] — the scaling-law numbers a
  * pretraining-data team reads before committing a crawl slice to the
  * mix: does the token distribution follow Zipf (natural language) or
  * is it templated (slope far from −1, tiny tail)? Does vocabulary
  * still grow with corpus size (Heaps exponent b ∈ (0,1)) or has the
  * source saturated (b→0, more of the same)? Which tokens are BURSTY
  * (topical — concentrated in few docs) vs uniform (function words)?
  * These complement [[Entropy]]'s per-source entropy and [[TextOps]]'
  * vocab census with the fitted-law view.
  *
  * Determinism contract (the house integer-aggregate rule): every
  * least-squares term is micro-quantized to int64 BEFORE the sum, so
  * the folds are merge-order free; the closed-form OLS arithmetic then
  * runs on exact integers in scalar double expressions (single
  * evaluation, not an aggregation — IEEE-identical in both engines).
  * Micro (1e6), not nano: ln-scale terms reach ~20, and the Σxy
  * products must stay below 2^63 across a 256-row fit window.
  *
  * Scale shape: one tokenize pass → token hash-agg (vocab-bounded) →
  * a rank window over the TOP-256 frame (sort-limit on the vocabulary,
  * never the corpus) → 1-row integer fold. Heaps checkpoints bucket
  * the doc stream by doc_id DIV 32 first, so the running-sum window
  * orders |docs|/32 bucket rows, not documents.
  */
object TextLaws {

  /** ln(rank)/ln(freq) micro-quantized. */
  private def lnMicro(c: Column): Column =
    floor(log(c.cast("double")) * 1e6 + lit(0.5)).cast("long")

  private val FitRanks = 256
  private val HeapsBucket = 32
  private val BurstyTokens = 64

  /** OLS slope/intercept (micro units) from integer moment sums.
    * n·Sxy etc. exceed 2^53 as doubles — the rounding is scalar-
    * expression-deterministic, identical in both engines, which is
    * all the hash gate needs (order-dependence only afflicts folds).
    */
  private def olsCols: Seq[Column] = {
    val n = count(lit(1)).cast("double")
    val sx = sum("x_micro").cast("double")
    val sy = sum("y_micro").cast("double")
    val sxy = sum(col("x_micro") * col("y_micro")).cast("double")
    val sxx = sum(col("x_micro") * col("x_micro")).cast("double")
    // x,y carry 1e6 scale; slope is scale-free, intercept keeps micro
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val interceptMicro = (sy - slope * sx) / n
    Seq(count(lit(1)).as("n_points"),
      floor(slope * 1e6 + lit(0.5)).cast("long").as("slope_micro"),
      floor(interceptMicro + lit(0.5)).cast("long").as("intercept_micro"))
  }

  /** Zipf law fit: ln(freq) vs ln(rank) OLS over the top-256 token
    * ranks. Natural text lands near slope ≈ −1 (Zipf 1949); templated
    * or synthetic sources drift toward 0 (flat head) or below −2
    * (degenerate head). One output row: vocab, token total, fit.
    */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val tot = cnt.agg(sum("freq").as("n_tokens"), count(lit(1)).as("vocab"))
    val ranked = cnt
      .orderBy(col("freq").desc, col("w").asc).limit(FitRanks)
      .select(row_number().over(
          Window.orderBy(col("freq").desc, col("w").asc)).as("rank"),
        col("freq"))
      .select(lnMicro(col("rank")).as("x_micro"), lnMicro(col("freq")).as("y_micro"))
    ranked.agg(olsCols.head, olsCols.tail: _*)
      .crossJoin(broadcast(tot)) // 1-row totals attachment
      .select(col("n_points"), col("vocab"), col("n_tokens"),
        col("slope_micro"), col("intercept_micro"))
  }

  /** Heaps-law vocabulary-growth checkpoints: the doc stream (doc_id
    * order) bucketed by DIV 32; per checkpoint the CUMULATIVE token
    * count and CUMULATIVE distinct vocabulary (each type counted at
    * its FIRST doc — min(doc_id) per token, so the cumulative distinct
    * is two bounded running sums, never a distinct-over-prefix scan).
    */
  def heapsLaw(s: SparkSession, d: String): DataFrame =
    heapsCheckpoints(s, d)
      .select(col("bucket"), col("n_cum_tokens"), col("v_cum_types"))

  private def heapsCheckpoints(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("w"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val firstSeen = toks.groupBy("w").agg(min("doc_id").as("first_doc"))
      .groupBy(col("first_doc").as("doc_id")).agg(count(lit(1)).as("n_new"))
    val perBucket = perDoc.join(firstSeen, Seq("doc_id"), "left")
      .groupBy((col("doc_id") / HeapsBucket).cast("long").as("bucket"))
      .agg(sum("n_toks").as("b_toks"),
        sum(coalesce(col("n_new"), lit(0L))).as("b_new"))
    // buckets grow with the corpus (doc_id div 32): the running sums
    // are range-partitioned prefix sums, not a single-partition window
    graft.core.ScalableRank
      .prefixSums(perBucket, Seq("b_toks", "b_new"),
        Seq("n_cum_tokens", "v_cum_types"), col("bucket").asc)
      .select(col("bucket"), col("n_cum_tokens"), col("v_cum_types"))
  }

  /** Heaps exponent: ln V = ln k + b·ln N OLS over the checkpoints.
    * b ∈ (0,1) for growing natural text; b→0 flags a saturated
    * (self-repeating) source. One row.
    */
  def heapsFit(s: SparkSession, d: String): DataFrame =
    heapsCheckpoints(s, d)
      .select(lnMicro(col("n_cum_tokens")).as("x_micro"),
        lnMicro(col("v_cum_types")).as("y_micro"))
      .agg(olsCols.head, olsCols.tail: _*)

  /** Token burstiness: Fano factor (variance-to-mean ratio of the
    * per-document count, zeros included) for the top-64 tokens by
    * document frequency. Fano ≈ its Poisson floor for function words
    * spread evenly; ≫ that for topical/bursty tokens (Church & Gale
    * 1995). Zeros never materialize: Var and mean derive from Σc, Σc²
    * and the doc total D alone.
    */
  def tokenBurstiness(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val dTotal = docs.agg(count(lit(1)).as("n_docs"))
    val perDocCnt = docs
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val perTok = perDocCnt.groupBy("w").agg(
      count(lit(1)).as("df_docs"),
      sum("c").as("total"),
      sum(col("c") * col("c")).as("sum_sq"))
    val top = perTok.orderBy(col("df_docs").desc, col("w").asc).limit(BurstyTokens)
    top.crossJoin(broadcast(dTotal)) // 1-row doc-count attachment
      .select(col("w"), col("df_docs"), col("total"),
        floor(((col("sum_sq").cast("double") / col("n_docs"))
          - (col("total").cast("double") / col("n_docs"))
            * (col("total").cast("double") / col("n_docs")))
          / (col("total").cast("double") / col("n_docs"))
          * 1e6 + lit(0.5)).cast("long").as("fano_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zipf_fit" -> zipfFit,
    "heaps_law" -> heapsLaw,
    "heaps_fit" -> heapsFit,
    "token_burstiness" -> tokenBurstiness)

  private val TokDuck =
    """list_filter(string_split_regex(text, '[^\p{L}]+'), x -> len(x) > 0)"""

  def oracleSql: Map[String, String] = Map(
    "zipf_fit" ->
      s"""WITH cnt AS (
         |  SELECT w, count(*) AS freq
         |  FROM (SELECT unnest($TokDuck) AS w FROM documents)
         |  GROUP BY w),
         |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_tokens,
         |          count(*) AS vocab FROM cnt),
         |ranked AS (
         |  SELECT row_number() OVER (ORDER BY freq DESC, w ASC) AS rank, freq
         |  FROM cnt ORDER BY freq DESC, w ASC LIMIT 256),
         |pts AS (
         |  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x_micro,
         |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y_micro
         |  FROM ranked),
         |m AS (
         |  SELECT count(*) AS n_points,
         |    CAST(sum(x_micro) AS BIGINT) AS sx, CAST(sum(y_micro) AS BIGINT) AS sy,
         |    CAST(sum(x_micro * y_micro) AS BIGINT) AS sxy,
         |    CAST(sum(x_micro * x_micro) AS BIGINT) AS sxx
         |  FROM pts),
         |fit AS (
         |  SELECT n_points,
         |    (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         |    sx, sy FROM m)
         |SELECT n_points, vocab, n_tokens,
         |  CAST(floor(slope * 1e6 + 0.5) AS BIGINT) AS slope_micro,
         |  CAST(floor((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         |    / n_points + 0.5) AS BIGINT) AS intercept_micro
         |FROM fit, tot""".stripMargin,
    "heaps_law" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($TokDuck) AS w FROM documents),
         |per_doc AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id),
         |first_seen AS (
         |  SELECT first_doc AS doc_id, count(*) AS n_new
         |  FROM (SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY w)
         |  GROUP BY first_doc),
         |per_bucket AS (
         |  SELECT CAST(floor(CAST(p.doc_id AS DOUBLE) / 32) AS BIGINT) AS bucket,
         |    CAST(sum(n_toks) AS BIGINT) AS b_toks,
         |    CAST(sum(coalesce(n_new, 0)) AS BIGINT) AS b_new
         |  FROM per_doc p LEFT JOIN first_seen f ON p.doc_id = f.doc_id
         |  GROUP BY 1)
         |SELECT bucket,
         |  CAST(sum(b_toks) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_cum_tokens,
         |  CAST(sum(b_new) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS v_cum_types
         |FROM per_bucket""".stripMargin,
    "heaps_fit" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($TokDuck) AS w FROM documents),
         |per_doc AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id),
         |first_seen AS (
         |  SELECT first_doc AS doc_id, count(*) AS n_new
         |  FROM (SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY w)
         |  GROUP BY first_doc),
         |per_bucket AS (
         |  SELECT CAST(floor(CAST(p.doc_id AS DOUBLE) / 32) AS BIGINT) AS bucket,
         |    CAST(sum(n_toks) AS BIGINT) AS b_toks,
         |    CAST(sum(coalesce(n_new, 0)) AS BIGINT) AS b_new
         |  FROM per_doc p LEFT JOIN first_seen f ON p.doc_id = f.doc_id
         |  GROUP BY 1),
         |cum AS (
         |  SELECT bucket,
         |    CAST(sum(b_toks) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum,
         |    CAST(sum(b_new) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v_cum
         |  FROM per_bucket),
         |pts AS (
         |  SELECT CAST(floor(ln(CAST(n_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x_micro,
         |    CAST(floor(ln(CAST(v_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y_micro
         |  FROM cum),
         |m AS (
         |  SELECT count(*) AS n_points,
         |    CAST(sum(x_micro) AS BIGINT) AS sx, CAST(sum(y_micro) AS BIGINT) AS sy,
         |    CAST(sum(x_micro * y_micro) AS BIGINT) AS sxy,
         |    CAST(sum(x_micro * x_micro) AS BIGINT) AS sxx
         |  FROM pts),
         |fit AS (
         |  SELECT n_points,
         |    (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         |    sx, sy FROM m)
         |SELECT n_points,
         |  CAST(floor(slope * 1e6 + 0.5) AS BIGINT) AS slope_micro,
         |  CAST(floor((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         |    / n_points + 0.5) AS BIGINT) AS intercept_micro
         |FROM fit""".stripMargin,
    "token_burstiness" ->
      s"""WITH per_doc_cnt AS (
         |  SELECT doc_id, w, count(*) AS c
         |  FROM (SELECT doc_id, unnest($TokDuck) AS w FROM documents)
         |  GROUP BY doc_id, w),
         |per_tok AS (
         |  SELECT w, count(*) AS df_docs,
         |    CAST(sum(c) AS BIGINT) AS total,
         |    CAST(sum(c * c) AS BIGINT) AS sum_sq
         |  FROM per_doc_cnt GROUP BY w
         |  ORDER BY df_docs DESC, w ASC LIMIT 64),
         |d AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT w, df_docs, total,
         |  CAST(floor(((CAST(sum_sq AS DOUBLE) / n_docs)
         |    - (CAST(total AS DOUBLE) / n_docs) * (CAST(total AS DOUBLE) / n_docs))
         |    / (CAST(total AS DOUBLE) / n_docs) * 1e6 + 0.5) AS BIGINT)
         |    AS fano_micro
         |FROM per_tok, d""".stripMargin)
}
