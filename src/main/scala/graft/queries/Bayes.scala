package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** Multinomial naive Bayes ([EXT]) — the classic add-one-smoothed
  * token model (McCallum & Nigam '98) trained on the documents table
  * to predict `lang` from token occurrences; the standard cheap
  * baseline next to [[Classifier]]'s logistic GD and [[Trees]]' CART.
  *
  * Exactness: every log-probability is ONE ln over a single exact
  * integer ratio, micro-quantized at the term level BEFORE summing —
  * per-document scores are integer sums of int64 terms, so argmax and
  * hash reproduce bit-for-bit in DuckDB (the mutual_info convention).
  *
  * Scale shape: one tokenize pass; the model is a vocab-bounded
  * (class, token) cell table built by one groupBy; scoring joins the
  * token stream against the cell table on the token key — linear,
  * partial-aggregated, never collected. Class count is data-bounded
  * small (languages); the per-class fan-out is a bounded multiply.
  */
object Bayes {

  private val Mega = 1000000L

  /** (doc_id, lang, token) occurrence stream — multiplicity kept
    * (multinomial model). */
  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(Dedup.tokensCol(col("text"))).as("token"))

  /** Smoothed per-(class, token) model: observed counts and
    * ln((c+1)/(N_c+V)) in micro-nats. One row per observed pair;
    * unseen pairs take the class default ln(1/(N_c+V)) at predict
    * time. */
  def nbTrain(s: SparkSession, d: String): DataFrame = {
    val t = toks(s, d)
    val counts = t.groupBy("lang", "token").agg(count(lit(1)).as("c"))
    val classTot = counts.groupBy("lang").agg(sum("c").as("n_c"))
    val vocab = counts.select("token").distinct()
      .agg(count(lit(1)).as("v"))
    counts.join(classTot, "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("token"), col("c"),
        floor(log((col("c") + 1).cast("double") / (col("n_c") + col("v")))
          * Mega + lit(0.5)).cast("long").as("logp_micro"))
  }

  /** Per-document posterior argmax: prior + Σ token terms (observed
    * pairs use the model cell, unseen the class default), ties →
    * lang asc. Emits actual and predicted lang with the winning
    * integer score. */
  def nbPredict(s: SparkSession, d: String): DataFrame = {
    val t = toks(s, d).stable
    val counts = t.groupBy("lang", "token").agg(count(lit(1)).as("c"))
    val vocab = counts.select("token").distinct()
      .agg(count(lit(1)).as("v"))
    val docsTot = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val classes = Tables.documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_cls_docs"))
      .join(counts.groupBy("lang").agg(sum("c").as("n_c")), "lang")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(docsTot))
      .select(col("lang").as("cls"),
        floor(log(col("n_cls_docs").cast("double") / col("n_docs"))
          * Mega + lit(0.5)).cast("long").as("prior_micro"),
        floor(log(lit(1.0) / (col("n_c") + col("v")))
          * Mega + lit(0.5)).cast("long").as("default_micro"))
      .stable
    // per-(class, token) model cells, keyed for the scoring join
    val model = {
      val classTot = counts.groupBy("lang").agg(sum("c").as("n_c"))
      counts.join(classTot, "lang").crossJoin(broadcast(vocab))
        .select(col("lang").as("cls"), col("token"),
          floor(log((col("c") + 1).cast("double") / (col("n_c") + col("v")))
            * Mega + lit(0.5)).cast("long").as("logp_micro"))
    }
    val terms = t.select(col("doc_id"), col("token"))
      .crossJoin(broadcast(classes.select("cls", "default_micro")))
      .join(model, Seq("cls", "token"), "left")
      .select(col("doc_id"), col("cls"),
        coalesce(col("logp_micro"), col("default_micro")).as("term"))
      .groupBy("doc_id", "cls").agg(sum("term").as("tok_micro"))
    val scored = Tables.documents(s, d).select("doc_id", "lang")
      .crossJoin(broadcast(classes.select("cls", "prior_micro")))
      .join(terms, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("prior_micro") + coalesce(col("tok_micro"), lit(0L)))
          .as("score_micro"))
    val rkW = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("cls").asc)
    val out = scored.withColumn("rk", row_number().over(rkW))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred_lang"),
        col("score_micro")).stable
    t.unpersist(false); classes.unpersist(false)
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nb_train" -> nbTrain,
    "nb_predict" -> nbPredict)

  private val baseSql =
    """t AS MATERIALIZED (
      |  SELECT doc_id, lang, unnest(ws) AS token
      |  FROM (SELECT doc_id, lang,
      |          list_filter(string_split_regex(text, '[^\p{L}]+'),
      |                      x -> len(x) > 0) AS ws
      |        FROM documents)),
      |counts AS MATERIALIZED (
      |  SELECT lang, token, count(*) AS c FROM t GROUP BY 1, 2),
      |vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
      |class_tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_c
      |              FROM counts GROUP BY lang)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "nb_train" ->
      s"""WITH $baseSql
         |SELECT c.lang, c.token, c.c,
         |  CAST(floor(ln(CAST(c.c + 1 AS DOUBLE) / (ct.n_c + v.v))
         |    * 1000000 + 0.5) AS BIGINT) AS logp_micro
         |FROM counts c JOIN class_tot ct USING (lang) CROSS JOIN vocab v""".stripMargin,
    "nb_predict" ->
      s"""WITH $baseSql,
         |docs_tot AS (SELECT count(*) AS n_docs FROM documents),
         |classes AS MATERIALIZED (
         |  SELECT d.lang AS cls,
         |    CAST(floor(ln(CAST(count(*) AS DOUBLE) / any_value(t.n_docs))
         |      * 1000000 + 0.5) AS BIGINT) AS prior_micro,
         |    CAST(floor(ln(1.0 / (any_value(ct.n_c) + any_value(v.v)))
         |      * 1000000 + 0.5) AS BIGINT) AS default_micro
         |  FROM documents d CROSS JOIN docs_tot t CROSS JOIN vocab v
         |  JOIN class_tot ct ON ct.lang = d.lang
         |  GROUP BY d.lang),
         |model AS MATERIALIZED (
         |  SELECT c.lang AS cls, c.token,
         |    CAST(floor(ln(CAST(c.c + 1 AS DOUBLE) / (ct.n_c + v.v))
         |      * 1000000 + 0.5) AS BIGINT) AS logp_micro
         |  FROM counts c JOIN class_tot ct USING (lang) CROSS JOIN vocab v),
         |terms AS (
         |  SELECT tk.doc_id, cl.cls,
         |    CAST(sum(coalesce(m.logp_micro, cl.default_micro)) AS BIGINT)
         |      AS tok_micro
         |  FROM t tk CROSS JOIN classes cl
         |  LEFT JOIN model m ON m.cls = cl.cls AND m.token = tk.token
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, d.lang, cl.cls,
         |    cl.prior_micro + coalesce(te.tok_micro, 0) AS score_micro
         |  FROM documents d CROSS JOIN classes cl
         |  LEFT JOIN terms te ON te.doc_id = d.doc_id AND te.cls = cl.cls)
         |SELECT doc_id, lang, cls AS pred_lang, score_micro
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score_micro DESC, cls ASC) AS rk FROM scored)
         |WHERE rk = 1""".stripMargin)
}
