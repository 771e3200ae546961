package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Readability scoring ([EXT]) — Flesch reading ease and
  * Flesch-Kincaid grade (Kincaid et al. '75) per document: the
  * surface-complexity screen quality pipelines run next to the
  * stopword/punctuation battery (Gopher rules filter on it too).
  *
  * Syllables use the standard vowel-group heuristic (runs of
  * [aeiouy] in the lowercased word, floor 1); sentences are runs of
  * [.!?] (floor 1). All counts are exact integers; the two scores
  * are single fixed-order IEEE chains over those integers,
  * micro-quantized — hash-identical in DuckDB.
  *
  * Scale shape: one map-only pass — tokenize, two regexp scans, an
  * integer fold per doc. No shuffle at all.
  */
object Readability {

  def readabilityScore(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"),
        greatest(size(col("ws")).cast("long"), lit(1L)).as("n_words"),
        greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))")
          .cast("long"), lit(1L)).as("n_sentences"),
        expr("""aggregate(ws, 0L, (acc, w) ->
            acc + greatest(size(regexp_extract_all(lower(w), '[aeiouy]+', 0)), 1))""")
          .as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        floor((lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
          * 1000000 + lit(0.5)).cast("long").as("flesch_micro"),
        floor((lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59)) * 1000000 + lit(0.5)).cast("long").as("fk_grade_micro"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "readability_score" -> readabilityScore)

  def oracleSql: Map[String, String] = Map(
    "readability_score" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    greatest(len(ws), 1) AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
        |    CAST(coalesce(list_sum(list_transform(ws, w ->
        |      greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1))), 0)
        |      AS BIGINT) AS n_syllables
        |  FROM (SELECT doc_id, text,
        |          list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                      x -> len(x) > 0) AS ws
        |        FROM documents))
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences, n_syllables,
        |  CAST(floor((206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
        |    * 1000000 + 0.5) AS BIGINT) AS flesch_micro,
        |  CAST(floor((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
        |      - 15.59) * 1000000 + 0.5) AS BIGINT) AS fk_grade_micro
        |FROM m""".stripMargin)
}
