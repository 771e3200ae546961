package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.{Classifier, Dedup}

/** Distributed full-batch logistic GD vs a sequential in-JVM reference
  * with the same featurization (md5-hashed dims, D-scaled tf + bias),
  * label (stopword-density gate), step schedule (Lr0/√t), and per-round
  * 1e-6 rounding — the rounding makes the two trajectories exactly
  * equal, so weights are compared with ===, not a tolerance.
  */
class ClassifierSpec extends SparkSuite {

  private val Stop = Set("the", "a", "of", "and", "to", "in", "is", "it")

  /** Same tokenizer as Dedup.tokensCol: split on non-letters. */
  private def toks(text: String): Seq[String] =
    text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq

  private def dimOf(tok: String): Int = {
    val h = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
    val hex = h.take(3).map(b => f"$b%02x").mkString // first 6 hex chars
    (java.lang.Long.parseLong(hex, 16) % Classifier.Dims).toInt
  }

  private def featurizeRef(docs: Seq[String]): Seq[(Array[Double], Double)] =
    docs.flatMap { text =>
      val ws = toks(text)
      if (ws.isEmpty) None
      else {
        val n = ws.size.toDouble
        val v = new Array[Double](Classifier.Dims + 1)
        ws.foreach(t => v(dimOf(t)) += 1.0)
        var i = 0
        while (i < Classifier.Dims) { v(i) = v(i) / n * Classifier.Dims; i += 1 }
        v(Classifier.Dims) = 1.0
        val y = if (ws.count(Stop) / n >= Classifier.SwTau) 1.0 else 0.0
        Some((v, y))
      }
    }

  private def trainRef(xy: Seq[(Array[Double], Double)]): Array[Double] = {
    val nD = Classifier.Dims + 1
    val n = xy.size.toDouble
    var w = new Array[Double](nD)
    for (t <- 1 to Classifier.Iters) {
      val g = new Array[Double](nD)
      xy.foreach { case (x, y) =>
        var m = 0.0; var i = 0
        while (i < nD) { m += x(i) * w(i); i += 1 }
        val r = 1.0 / (1.0 + math.exp(-m)) - y
        i = 0
        while (i < nD) { g(i) += r * x(i); i += 1 }
      }
      val lr = Classifier.Lr0 / math.sqrt(t.toDouble)
      w = w.indices.map(i =>
        math.floor((w(i) - lr * g(i) / n) * 1e6 + 0.5) / 1e6).toArray
    }
    w
  }

  test("distributed GD equals the sequential reference exactly (post-rounding)") {
    val docs = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0)).toSeq
    val ref = trainRef(featurizeRef(docs))
    val got = Classifier.classifierTrain(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size === Classifier.Dims + 1)
    ref.zipWithIndex.foreach { case (wv, i) =>
      assert(got(i) === wv, s"weight $i diverged")
    }
  }

  test("the distilled model genuinely learns the gate: above-baseline accuracy, non-degenerate confusion") {
    val cm = Classifier.classifierPredict(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val total = cm.values.sum
    val pos = cm.collect { case ((1, _), n) => n }.sum
    val correct = cm.getOrElse((0, 0), 0L) + cm.getOrElse((1, 1), 0L)
    val baseline = math.max(pos, total - pos) // majority class
    assert(correct > baseline,
      s"accuracy ${correct}/$total does not beat majority $baseline/$total: $cm")
    // it actually fires on positives (not the all-negative degenerate model)
    assert(cm.getOrElse((1, 1), 0L) > 0, s"never predicts positive on a positive: $cm")
  }

  test("classifier_auc equals the naive pairwise P(s+ > s-) + half-ties count") {
    // per-doc (score_q, y): labels from the featurized frame, scores
    // from model_gate's 1e-6-quantized margins (the same chain the
    // operator ranks)
    val y = Classifier.featurize(spark, sfDir)
      .select("doc_id", "y").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scored = Classifier.modelGate(spark, sfDir).collect().map { r =>
      (math.floor(r.getDouble(1) * 1e6 + 0.5).toLong, y(r.getLong(0)))
    }
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expect = math.floor(wins.toDouble
      / (2.0 * pos.length * neg.length) * 1e6 + 0.5).toLong
    val row = Classifier.classifierAuc(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1)) ==
      ((pos.length.toLong, neg.length.toLong)))
    assert(row.getLong(2) == expect,
      s"AUC ${row.getLong(2)} != naive pairwise $expect")
    // the learned gate must rank positives above chance
    assert(row.getLong(2) > 500000L, "AUC not above 0.5 for a trained model")
  }

  test("classifier_kappa equals the chance-corrected recompute from the confusion matrix") {
    // the cells come from classifier_predict (its own oracle-gated
    // aggregation path); kappa's arithmetic is mirrored exactly
    val cm = Classifier.classifierPredict(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    val (n11, n10, n01, n00) = (cm((1, 1)), cm((1, 0)), cm((0, 1)), cm((0, 0)))
    val n = n11 + n10 + n01 + n00
    val pe = (n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01)
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val row = Classifier.classifierKappa(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert(row.getLong(5) == micro((n11 + n00).toDouble / n), "p_o")
    assert(row.getLong(6) == micro(pe.toDouble / (n * n)), "p_e")
    assert(row.getLong(7) ==
      micro((n * (n11 + n00) - pe).toDouble / (n * n - pe)), "kappa")
    // chance-corrected agreement of a genuinely-learned gate is
    // positive and strictly below raw agreement
    assert(row.getLong(7) > 0L && row.getLong(7) < row.getLong(5))
  }

  test("label_noise_report ranks the largest-margin disagreements exactly") {
    val y = Classifier.featurize(spark, sfDir)
      .select("doc_id", "y").collect()
      .map(r => r.getLong(0) -> r.getDouble(1).toInt).toMap
    // modelGate's scores are the same quantized margins the report uses
    val margins = Classifier.modelGate(spark, sfDir).collect().map { r =>
      r.getLong(0) -> math.floor(r.getDouble(1) * 1e6 + 0.5).toLong
    }.toMap
    val expect = margins.toSeq
      .filter { case (id, m) => (m > 0) != (y(id) == 1) }
      .sortBy { case (id, m) => (-math.abs(m), id) }
      .take(Classifier.NoiseTopK).zipWithIndex
      .map { case ((id, m), i) => (i + 1, id, y(id), m) }
    val got = Classifier.labelNoiseReport(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == expect, "suspect ranking diverged")
    // the triage list is non-degenerate: a 0.97-accuracy gate still
    // disagrees somewhere, and confidently so
    assert(got.nonEmpty && got.head._4 != 0L)
  }
}
