package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Stratified k-fold assignment ([EXT]) — the cross-validation split
  * an ML pipeline materializes once and reuses across trainers:
  * within each language stratum, documents are ranked by md5 (the
  * deterministic shuffle) and dealt round-robin into [[Folds]] folds,
  * so every fold carries each stratum in proportion (fold sizes
  * within each stratum differ by at most 1 — asserted in the spec,
  * unlike independent-hash assignment whose strata drift √n). Emits
  * the per-(fold, stratum) census with fold share per stratum.
  *
  * Scale shape: one rank window per stratum (the natural partition
  * key) + a |folds·strata|-cell census. Assignment is reproducible
  * across runs/backfills — membership depends only on md5 order.
  */
object Kfold {

  val Folds = 5L

  def stratifiedKfold(s: SparkSession, d: String): DataFrame = {
    // per-lang rank via the ScalableRank grouped rank (global range
    // sort + per-lang offsets) — langs are few and populations huge,
    // so a per-lang window partition would serialize each language
    val assigned = graft.core.ScalableRank
      .groupedRank(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"))
          .withColumn("__k",
            md5(concat(lit("kf:"), col("doc_id").cast("string")))),
        "lang", "__rn", "__n_g", col("__k").asc, col("doc_id").asc)
      .withColumn("fold", (col("__rn") - 1) % Folds)
    val strat = Window.partitionBy("lang")
    assigned.groupBy("fold", "lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_stratum", sum("n_docs").over(strat))
      .select(col("fold"), col("lang"), col("n_docs"), col("n_stratum"),
        expr("n_docs * 1000000L div n_stratum").as("share_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stratified_kfold" -> stratifiedKfold)

  def oracleSql: Map[String, String] = Map(
    "stratified_kfold" ->
      s"""WITH assigned AS (
         |  SELECT doc_id, lang,
         |    (row_number() OVER (PARTITION BY lang
         |       ORDER BY md5('kf:' || CAST(doc_id AS VARCHAR)), doc_id) - 1)
         |      % $Folds AS fold
         |  FROM documents),
         |census AS (
         |  SELECT fold, lang, count(*) AS n_docs
         |  FROM assigned GROUP BY 1, 2)
         |SELECT CAST(fold AS BIGINT) AS fold, lang, n_docs,
         |  CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum,
         |  CAST(n_docs * 1000000
         |    // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS share_micro
         |FROM census""".stripMargin)
}
