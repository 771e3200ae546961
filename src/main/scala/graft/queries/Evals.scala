package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** N-gram overlap eval metrics [EXT] — ROUGE-N recall and clipped
  * BLEU precision (Papineni et al. 2002; Lin 2004), the scoring half
  * of a summarization/generation eval pipeline. Harnessed here on a
  * deterministic candidate/reference pair available in every corpus:
  * candidate = the LEAD 20% of each document's tokens, reference =
  * the remaining body. That makes the metrics double as curation
  * signals — lead-vs-body ROUGE recall is a redundancy detector
  * (boilerplate-heavy docs repeat their lead), and the same clipped
  * n-gram machinery scores real (candidate, reference) text pairs
  * unchanged.
  *
  * Mechanics: clipped matches Σ_g min(count_cand(g), count_ref(g))
  * computed RELATIONALLY — explode each side to (doc, gram, count)
  * and inner-join on (doc, gram); grams absent from either side
  * contribute zero and never materialize. Per-doc metrics are
  * micro-quantized int64, per-source averages are exact integer
  * sums DIV counts — merge-order free end to end.
  *
  * Scale shape: map-side n-gram explode → one (doc, gram) hash agg
  * per side → an equi join keyed (doc, gram) → per-doc then
  * per-source hash aggs. No window, no driver state; everything
  * partitions by doc_id.
  */
object Evals {

  /** Docs shorter than this many tokens are skipped (the lead must
    * hold a bigram and the body must dominate the lead).
    */
  private val MinTokens = 10

  /** Per-doc frame: doc_id, source, c_len (lead tokens), b_len (body
    * tokens), m1/m2 (clipped unigram/bigram matches).
    */
  private def perDoc(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), col("source"), col("ws"), size(col("ws")).as("len"))
      .filter(col("len") >= MinTokens)
      .select(col("doc_id"), col("source"),
        ceil(col("len") / lit(5.0)).cast("int").as("c_len"), col("len"),
        col("ws"))
      .select(col("doc_id"), col("source"), col("c_len"),
        (col("len") - col("c_len")).as("b_len"),
        slice(col("ws"), lit(1), col("c_len")).as("lead"),
        slice(col("ws"), col("c_len") + lit(1), col("len") - col("c_len"))
          .as("body"))
    // bigram arrays from MATERIALIZED token-array attributes (HOFs
    // re-evaluate non-attribute subtrees per element — Dedup.shingles'
    // rule)
    def bigrams(arr: String) = transform(
      sequence(lit(1), size(col(arr)) - 1),
      i => concat_ws(" ", element_at(col(arr), i), element_at(col(arr), i + 1)))
    val sides = base.select(col("doc_id"), col("source"), col("c_len"),
      col("b_len"), col("lead"), col("body"),
      bigrams("lead").as("lead2"), bigrams("body").as("body2"))

    def cnt(arr: String) = sides
      .select(col("doc_id"), explode(col(arr)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    def clipped(a: String, b: String, out: String) =
      cnt(a).withColumnRenamed("c", "ca")
        .join(cnt(b).withColumnRenamed("c", "cb"), Seq("doc_id", "g"))
        .groupBy("doc_id").agg(sum(least(col("ca"), col("cb"))).as(out))

    sides.select("doc_id", "source", "c_len", "b_len")
      .join(clipped("lead", "body", "m1"), Seq("doc_id"), "left")
      .join(clipped("lead2", "body2", "m2"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("c_len"), col("b_len"),
        coalesce(col("m1"), lit(0L)).as("m1"),
        coalesce(col("m2"), lit(0L)).as("m2"))
  }

  /** ROUGE-1/2 recall of the lead against the body, averaged per
    * source (micro units): how much of the body's content the lead
    * already covers — the redundancy read.
    */
  def evalRouge(s: SparkSession, d: String): DataFrame =
    perDoc(s, d)
      .select(col("source"),
        floor(col("m1").cast("double") / col("b_len") * 1e6 + lit(0.5))
          .cast("long").as("r1_t"),
        floor(col("m2").cast("double") / (col("b_len") - 1) * 1e6 + lit(0.5))
          .cast("long").as("r2_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(r1_t) AS BIGINT) DIV count(1)").as("rouge1_micro"),
        expr("CAST(sum(r2_t) AS BIGINT) DIV count(1)").as("rouge2_micro"))

  /** Clipped BLEU-2 of the lead against the body (precision side +
    * brevity penalty exp(1 − r/c), geometric-mean score), averaged
    * per source.
    */
  def evalBleu(s: SparkSession, d: String): DataFrame =
    perDoc(s, d)
      .select(col("source"),
        floor(col("m1").cast("double") / col("c_len") * 1e6 + lit(0.5))
          .cast("long").as("p1_t"),
        floor(col("m2").cast("double") / (col("c_len") - 1) * 1e6 + lit(0.5))
          .cast("long").as("p2_t"),
        floor(exp(lit(1.0) - col("b_len").cast("double") / col("c_len"))
          * sqrt((col("m1").cast("double") / col("c_len"))
            * (col("m2").cast("double") / (col("c_len") - 1)))
          * 1e6 + lit(0.5)).cast("long").as("bleu_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(p1_t) AS BIGINT) DIV count(1)").as("p1_micro"),
        expr("CAST(sum(p2_t) AS BIGINT) DIV count(1)").as("p2_micro"),
        expr("CAST(sum(bleu_t) AS BIGINT) DIV count(1)").as("bleu2_micro"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_rouge" -> evalRouge,
    "eval_bleu" -> evalBleu)

  /** Shared per-doc CTE chain (DuckDB): lead/body split, both n-gram
    * orders, clipped matches via (doc, gram) joins.
    */
  private val PerDocDuck =
    """base AS (
      |  SELECT doc_id, source,
      |    CAST(ceil(len(ws) / 5.0) AS INTEGER) AS c_len,
      |    len(ws) - CAST(ceil(len(ws) / 5.0) AS INTEGER) AS b_len,
      |    ws[1 : CAST(ceil(len(ws) / 5.0) AS INTEGER)] AS lead,
      |    ws[CAST(ceil(len(ws) / 5.0) AS INTEGER) + 1 : len(ws)] AS body
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split_regex(text, '[^\p{L}]+'),
      |                      x -> len(x) > 0) AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 10),
      |sides AS (
      |  SELECT doc_id, source, c_len, b_len, lead, body,
      |    list_transform(generate_series(1, len(lead) - 1),
      |      i -> lead[i] || ' ' || lead[i+1]) AS lead2,
      |    list_transform(generate_series(1, len(body) - 1),
      |      i -> body[i] || ' ' || body[i+1]) AS body2
      |  FROM base),
      |ca1 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(lead) AS g FROM sides) GROUP BY 1, 2),
      |cb1 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(body) AS g FROM sides) GROUP BY 1, 2),
      |ca2 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(lead2) AS g FROM sides) GROUP BY 1, 2),
      |cb2 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(body2) AS g FROM sides) GROUP BY 1, 2),
      |m1 AS (SELECT ca1.doc_id, CAST(sum(least(ca1.c, cb1.c)) AS BIGINT) AS m
      |       FROM ca1 JOIN cb1 ON ca1.doc_id = cb1.doc_id AND ca1.g = cb1.g
      |       GROUP BY 1),
      |m2 AS (SELECT ca2.doc_id, CAST(sum(least(ca2.c, cb2.c)) AS BIGINT) AS m
      |       FROM ca2 JOIN cb2 ON ca2.doc_id = cb2.doc_id AND ca2.g = cb2.g
      |       GROUP BY 1),
      |per_doc AS (
      |  SELECT s.doc_id, s.source, s.c_len, s.b_len,
      |    coalesce(m1.m, 0) AS m1, coalesce(m2.m, 0) AS m2
      |  FROM sides s
      |  LEFT JOIN m1 ON s.doc_id = m1.doc_id
      |  LEFT JOIN m2 ON s.doc_id = m2.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "eval_rouge" ->
      s"""WITH $PerDocDuck
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CAST(floor(CAST(m1 AS DOUBLE) / b_len * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS rouge1_micro,
         |  CAST(sum(CAST(floor(CAST(m2 AS DOUBLE) / (b_len - 1) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS rouge2_micro
         |FROM per_doc GROUP BY source""".stripMargin,
    "eval_bleu" ->
      s"""WITH $PerDocDuck
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CAST(floor(CAST(m1 AS DOUBLE) / c_len * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS p1_micro,
         |  CAST(sum(CAST(floor(CAST(m2 AS DOUBLE) / (c_len - 1) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS p2_micro,
         |  CAST(sum(CAST(floor(exp(1.0 - CAST(b_len AS DOUBLE) / c_len)
         |    * sqrt((CAST(m1 AS DOUBLE) / c_len)
         |      * (CAST(m2 AS DOUBLE) / (c_len - 1))) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS bleu2_micro
         |FROM per_doc GROUP BY source""".stripMargin)
}
