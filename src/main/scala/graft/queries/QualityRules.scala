package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Gopher-style rule-battery quality filtering (Rae et al. 2021,
  * "Scaling Language Models" appendix A — the published pre-training
  * heuristics): hard per-document rules with named flags, unlike
  * [[TextOps.qualityScore]]'s soft composite. Emitting the per-rule
  * verdicts (not just keep/drop) is the operational contract — a
  * pipeline owner tunes thresholds from the rule-failure census, not
  * from a single opaque score.
  *
  * Thresholds are adapted to the synthetic corpus' ranges (10–99
  * words, 30-word vocabulary; Gopher's 50–100k word bounds would pass
  * everything): word count 25–500, mean word length 3–5, duplicate-
  * bigram fraction ≤ 0.10, ≥ 2 distinct stopwords present. Rules
  * whose inputs this corpus cannot exercise (symbol ratio, bullet
  * lines) are deliberately absent rather than vacuously true.
  *
  * Scale: one tokenize pass, everything per-row (map-only until the
  * report's per-source aggregate) — no shuffle in the flag pass at
  * all, which is the property that lets the gate run inline with
  * ingest at 100 TB.
  */
object QualityRules {

  private val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def toks(c: Column): Column =
    filter(split(c, "[^\\p{L}]+"), w => length(w) > 0)

  /** Per-doc rule flags. Ratio rules compare the floor-quantized 4dp
    * value (both engines produce the identical IEEE double for
    * n/10000.0, so boundary docs land on the same side).
    */
  def qualityGopher(s: SparkSession, d: String): DataFrame = {
    val ws = col("ws")
    val nw = size(ws)
    val sumLen = aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x)
    val mwl = round(sumLen.cast("double") / nw, 4)
    val bigrams = transform(sequence(lit(1), nw - 1),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))
    val dupBi = when(nw >= 2,
      floor((lit(1.0) - size(array_distinct(bigrams)).cast("double") / (nw - 1))
        * 10000 + 0.5) / 10000.0).otherwise(lit(0.0))
    val stopArr = array(Stop.map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(ws), stopArr))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        nw.cast("long").as("n_words"),
        mwl.as("mean_word_len"),
        dupBi.as("dup_bigram_frac"),
        stopHits.cast("long").as("stop_hits"),
        (nw >= 25 && nw <= 500).as("rule_words"),
        (mwl >= 3.0 && mwl <= 5.0).as("rule_word_len"),
        (dupBi <= 0.10).as("rule_repetition"),
        (stopHits >= 2).as("rule_stopwords"))
      .withColumn("keep",
        col("rule_words") && col("rule_word_len") &&
          col("rule_repetition") && col("rule_stopwords"))
  }

  /** Rule-failure census per source — the tuning report: how many
    * docs each rule rejects, per ingest source, plus the survival
    * rate. Aggregates the flag pass down to |sources| rows.
    */
  def qualityGopherReport(s: SparkSession, d: String): DataFrame =
    qualityGopher(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("rule_words"), 1L).otherwise(0L)).as("fail_words"),
        sum(when(!col("rule_word_len"), 1L).otherwise(0L)).as("fail_word_len"),
        sum(when(!col("rule_repetition"), 1L).otherwise(0L)).as("fail_repetition"),
        sum(when(!col("rule_stopwords"), 1L).otherwise(0L)).as("fail_stopwords"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate",
        floor(col("n_keep").cast("double") / col("n_docs") * 10000 + 0.5) / 10000.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_gopher" -> qualityGopher,
    "quality_gopher_report" -> qualityGopherReport)

  private[queries] val flagsSql =
    """flags AS (
      |  SELECT doc_id, source,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    round(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 4)
      |      AS mean_word_len,
      |    CASE WHEN len(w) >= 2 THEN
      |      floor((1.0 - len(list_distinct(list_transform(
      |          generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])))::DOUBLE
      |        / (len(w) - 1)) * 10000 + 0.5) / 10000.0
      |    ELSE 0.0 END AS dup_bigram_frac,
      |    CAST(len(list_intersect(list_distinct(w),
      |      ['the','a','of','and','to','in','is','it'])) AS BIGINT) AS stop_hits
      |  FROM tok),
      |ruled AS (
      |  SELECT *,
      |    n_words >= 25 AND n_words <= 500 AS rule_words,
      |    mean_word_len >= 3.0 AND mean_word_len <= 5.0 AS rule_word_len,
      |    dup_bigram_frac <= 0.10 AS rule_repetition,
      |    stop_hits >= 2 AS rule_stopwords
      |  FROM flags)""".stripMargin

  private[queries] val tokSql =
    """tok AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(text, '[^\p{L}]+'), x -> len(x) > 0) AS w
      |  FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "quality_gopher" ->
      s"""WITH $tokSql,
         |$flagsSql
         |SELECT doc_id, source, n_words, mean_word_len, dup_bigram_frac,
         |  stop_hits, rule_words, rule_word_len, rule_repetition,
         |  rule_stopwords,
         |  rule_words AND rule_word_len AND rule_repetition AND rule_stopwords
         |    AS keep
         |FROM ruled""".stripMargin,
    "quality_gopher_report" ->
      s"""WITH $tokSql,
         |$flagsSql,
         |kept AS (
         |  SELECT *, rule_words AND rule_word_len AND rule_repetition
         |    AND rule_stopwords AS keep FROM ruled)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN NOT rule_words THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_words,
         |  CAST(sum(CASE WHEN NOT rule_word_len THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_word_len,
         |  CAST(sum(CASE WHEN NOT rule_repetition THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_repetition,
         |  CAST(sum(CASE WHEN NOT rule_stopwords THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_stopwords,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  floor(sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*)
         |    * 10000 + 0.5) / 10000.0 AS keep_rate
         |FROM kept GROUP BY 1""".stripMargin)
}
