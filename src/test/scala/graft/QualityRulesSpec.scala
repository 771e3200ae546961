package graft

import graft.queries.QualityRules

/** Gopher rule-battery contracts: flag/keep consistency, the map-only
  * plan promise for the flag pass, and report-vs-flags reconciliation.
  * Cross-engine values live under the driver's DuckDB gate.
  */
class QualityRulesSpec extends SparkSuite {

  test("keep is exactly the conjunction of the four rule flags") {
    val rows = QualityRules.qualityGopher(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("rule_words") && r.getAs[Boolean]("rule_word_len") &&
        r.getAs[Boolean]("rule_repetition") && r.getAs[Boolean]("rule_stopwords")
      assert(r.getAs[Boolean]("keep") === conj, s"doc ${r.getLong(0)}")
    }
    // thresholds must be live on this corpus: some docs drop, some keep
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length, s"degenerate selectivity: $kept/${rows.length}")
  }

  test("flag pass is map-only: no exchange in the physical plan") {
    val plan = QualityRules.qualityGopher(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flag pass must not shuffle:\n$plan")
  }

  test("report reconciles with the flag pass") {
    import org.apache.spark.sql.functions._
    val flags = QualityRules.qualityGopher(spark, sfDir)
    val rep = QualityRules.qualityGopherReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(6))).toMap
    val exp = flags.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep === exp)
  }

  test("corpus_card reconciles with its component passes") {
    import org.apache.spark.sql.functions._
    val card = graft.queries.CorpusCard.corpusCard(spark, sfDir).collect()(0)
    val docs = graft.core.Tables.documents(spark, sfDir)
    assert(card.getLong(0) === docs.count())
    assert(card.getLong(2) === docs.agg(sum("n_chars")).collect()(0).getLong(0))
    assert(card.getLong(3) === docs.select("lang").distinct().count())
    assert(card.getLong(4) === docs.select("source").distinct().count())
    val dup = 1.0 - docs.select(md5(col("text"))).distinct().count().toDouble /
      docs.count()
    assert(math.abs(card.getDouble(5) - dup) < 1e-3)
    val keep = QualityRules.qualityGopher(spark, sfDir)
      .filter(col("keep")).count().toDouble / docs.count()
    assert(math.abs(card.getDouble(6) - keep) < 1e-3)
  }

  test("rule_repetition: a planted repetitive text fails, natural text passes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant via the same expressions on a local frame: 30 words of one
    // bigram loop → dup fraction near 1
    val planted = Seq.fill(30)("spam ham").mkString(" ")
    val ws = filter(split(col("text"), "[^\\p{L}]+"), w => length(w) > 0)
    val nw = size(ws)
    val bigrams = transform(sequence(lit(1), nw - 1),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))
    val dup = lit(1.0) - size(array_distinct(bigrams)).cast("double") / (nw - 1)
    val v = Seq(planted).toDF("text").select(dup.as("d")).collect()(0).getDouble(0)
    assert(v > 0.9, s"planted repetition not detected: $v")
  }
}
