package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Curation-effect measurement [EXT] — the report a data team reads
  * after dedup: do the documents the near-dup keep pass DROPS differ
  * in quality from the canon it keeps? One row per side (kept = 1 /
  * dropped = 0) with integer-exact quality ingredients: doc count,
  * mean token count, stopword share, punctuation share. On this
  * corpus near-dups are templated variants, so the dropped side
  * mirrors the kept side — itself the finding that dedup is not
  * biasing the quality mix (the check Lee et al. run before
  * trusting dedup at scale).
  *
  * Exactness: every measure is an integer-sum ratio ((Σ·1e6) DIV Σ)
  * — no float averaging. The keep set is [[Cluster.dedupKeep]]'s
  * oracle-gated survivors; ingredients are [[TextOps]]'
  * quality_score counters.
  *
  * Scale shape: the keep set is the dedup pipeline the repo already
  * prices (MinHash twin for 100 TB); ingredients are one map pass;
  * the report is a 2-row aggregate.
  */
object QualityLift {

  def dedupQualityLift(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(TextOps.StopwordsPub.map(lit): _*)
    val ing = Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", ""))
          .cast("long").as("n_punct"),
        Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), col("n_chars"), col("n_punct"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(filter(col("ws"), w => array_contains(stopArr, w)))
          .cast("long").as("n_stop"))
    val kept = Cluster.dedupKeep(s, d)
      .select(col("doc_id"), lit(1L).as("kept"))
    ing.join(kept, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("kept"), lit(0L)))
      .groupBy("kept")
      .agg(count(lit(1)).as("n_docs"),
        expr("(sum(n_tokens) * 1000000) DIV count(*)").as("mean_tokens_micro"),
        expr("(sum(n_stop) * 1000000) DIV sum(n_tokens)").as("stop_share_micro"),
        expr("(sum(n_punct) * 1000000) DIV sum(n_chars)").as("punct_share_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_quality_lift" -> dedupQualityLift)

  def oracleSql: Map[String, String] = Map(
    "dedup_quality_lift" -> {
      val stops = TextOps.StopwordsPub.map(w => s"'$w'").mkString(",")
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |      generate_series(1, len(w) - 2),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         |    ELSE [] END AS shingles
         |  FROM (SELECT doc_id,
         |          list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0) AS w
         |        FROM documents)),
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
         |keepers AS (
         |  SELECT d.doc_id FROM documents d
         |  LEFT JOIN lab ON lab.node = d.doc_id
         |  WHERE lab.node IS NULL OR lab.node = lab.cluster_id),
         |ing AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))
         |      AS BIGINT) AS n_punct,
         |    CAST(len(ws) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(ws, x -> list_contains([$stops], x)))
         |      AS BIGINT) AS n_stop
         |  FROM (SELECT doc_id, text,
         |          list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                      x -> len(x) > 0) AS ws
         |        FROM documents)),
         |f AS (
         |  SELECT ing.*, CASE WHEN k.doc_id IS NULL THEN 0 ELSE 1 END AS kept
         |  FROM ing LEFT JOIN keepers k ON k.doc_id = ing.doc_id)
         |SELECT CAST(kept AS BIGINT) AS kept, count(*) AS n_docs,
         |  CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT)
         |    AS mean_tokens_micro,
         |  CAST(sum(n_stop) * 1000000 // sum(n_tokens) AS BIGINT)
         |    AS stop_share_micro,
         |  CAST(sum(n_punct) * 1000000 // sum(n_chars) AS BIGINT)
         |    AS punct_share_micro
         |FROM f GROUP BY kept""".stripMargin
    })
}
