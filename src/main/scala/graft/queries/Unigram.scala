package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Unigram-LM tokenizer (Kudo '18, the SentencePiece algorithm) —
  * the second of the two real-world subword tokenizers, next to
  * [[Tokenize]]'s BPE: seed a substring vocabulary, then EM — Viterbi-
  * segment every word under current piece probabilities (E), re-
  * estimate probabilities from weighted piece usage (M) — for a fixed
  * round count. Unlike BPE's greedy merges, segmentation is globally
  * optimal per word under the learned LM.
  *
  * Scale design (the [[Tokenize.bpeEncode]] distinct-word contract):
  *  - All heavy work runs on the DISTINCT-WORD working set weighted by
  *    corpus frequency — the corpus token stream is touched once to
  *    build (word, freq) and once more at the end to join results
  *    back; 100 TB of text collapses to vocabulary cardinality.
  *  - The piece vocabulary is CAPPED at [[SeedCap]] multi-char pieces
  *    (top by weighted frequency, deterministic (freq desc, piece)
  *    tie-break) + the full single-char alphabet, so the broadcast
  *    and the per-round driver action are bounded by constants, not
  *    corpus size — the Kmeans/BPE bounded-collect contract.
  *  - Each EM round is ONE distributed pass: flatMap Viterbi over
  *    distinct words (pure per-row DP, O(len·MaxPieceLen) each) with
  *    the probs broadcast, partial-agg'd piece counts, vocab-bounded
  *    collect, driver M-step.
  *
  * Determinism: integer seed frequencies; Viterbi tie-break is (score,
  * then longest-last-piece); probabilities are rounded to 1e-9 after
  * every M-step. Float argmax margins make a cross-engine SQL oracle
  * flaky by construction (the pca precedent — SURVEY §2.4), so both
  * queries are spec-certified: UnigramSpec pins the full pipeline to a
  * sequential in-JVM reference (same seed rules, same EM, shared
  * Viterbi kernel) and asserts the segmentation-consistency
  * invariants.
  */
object Unigram {

  val MaxPieceLen = 4
  val SeedCap = 4096
  val MinFreq = 2L
  val EmRounds = 3

  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  /** Viterbi-best segmentation of `word` under piece probabilities.
    * Ties: higher score wins; equal score → the split whose LAST piece
    * is longer (smaller back-pointer) — deterministic everywhere.
    * Words with uncovered chars fall back to per-char pieces (cannot
    * happen when the alphabet is retained, asserted in the spec).
    */
  def viterbi(word: String, probs: scala.collection.Map[String, Double]): List[String] = {
    val L = word.length
    val NEG = Double.NegativeInfinity
    val best = Array.fill(L + 1)(NEG)
    val back = Array.fill(L + 1)(Int.MaxValue)
    best(0) = 0.0
    var j = 1
    while (j <= L) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) {
        if (best(i) != NEG) {
          val p = probs.getOrElse(word.substring(i, j), 0.0)
          if (p > 0.0) {
            val sc = best(i) + math.log(p)
            if (sc > best(j) || (sc == best(j) && i < back(j))) {
              best(j) = sc
              back(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    if (best(L) == NEG) return word.map(_.toString).toList
    var out = List.empty[String]
    var k = L
    while (k > 0) {
      val i = back(k)
      out = word.substring(i, k) :: out
      k = i
    }
    out
  }

  /** (word, freq) over the corpus token stream. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Seed vocabulary: every substring up to [[MaxPieceLen]] weighted by
    * word frequency; singles always kept (segmentability), multis
    * gated at [[MinFreq]] and capped at [[SeedCap]].
    */
  private[graft] def seedPieces(wf: Seq[(String, Long)]): Seq[(String, Long)] = {
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + MaxPieceLen)) {
          val p = w.substring(i, j)
          subCounts.update(p, subCounts.getOrElse(p, 0L) + f)
          j += 1
        }
        i += 1
      }
    }
    val singles = subCounts.iterator.filter(_._1.length == 1).toSeq
    val multis = subCounts.iterator
      .filter { case (p, c) => p.length > 1 && c >= MinFreq }
      .toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(SeedCap)
    singles ++ multis
  }

  /** The EM loop from a seed vocabulary — shared by the distributed
    * trainer and the spec's sequential reference; `countsOf` supplies
    * each round's Viterbi usage counts (distributed flatMap pass, or
    * a local loop in the spec). Returns the final piece → weighted
    * usage count map.
    */
  private[graft] def emLoop(
      seed: Seq[(String, Long)],
      countsOf: (scala.collection.Map[String, Double]) => Seq[(String, Long)])
      : Map[String, Long] = {
    var probs: Map[String, Double] = {
      val tot = seed.map(_._2).sum.toDouble
      seed.map { case (p, c) => p -> round9(c / tot) }.toMap
    }
    var counts = Map.empty[String, Long]
    for (_ <- 1 to EmRounds) {
      val raw = countsOf(probs).toMap
      // Laplace-retain the alphabet: a never-used single char keeps
      // count 1 so every word stays segmentable in later rounds.
      counts = probs.keysIterator.map { p =>
        val c = raw.getOrElse(p, 0L)
        p -> (if (p.length == 1) c + 1L else c)
      }.filter(_._2 > 0L).toMap
      val tot = counts.valuesIterator.sum.toDouble
      probs = counts.map { case (p, c) => p -> round9(c / tot) }
    }
    counts
  }

  /** Distributed seed pass: weighted substring census over the
    * distinct words (flatMap explode + partial-agg'd count), collected
    * only AFTER the alphabet filter / MinFreq gate / SeedCap top-k —
    * the driver never sees more than SeedCap + alphabet rows however
    * large the corpus vocabulary is.
    */
  private def seedDistributed(s: SparkSession,
      wfDs: org.apache.spark.sql.Dataset[(String, Long)]): Seq[(String, Long)] = {
    import s.implicits._
    val subs = wfDs.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + MaxPieceLen)
      } yield (w.substring(i, j), f)
    }.groupBy("_1").agg(sum("_2").as("c")).toDF("p", "c")
    val singles = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect()
    val multis = subs.filter(length(col("p")) > 1 && col("c") >= MinFreq)
      .orderBy(col("c").desc, col("p").asc).limit(SeedCap)
      .as[(String, Long)].collect()
    (singles ++ multis).toSeq
  }

  /** Distributed trainer: returns the final (piece, cnt) counts. Each
    * EM round = one flatMap pass over the cached distinct words with
    * the probs broadcast + a partial-agg'd count + a vocab-bounded
    * collect.
    */
  private[graft] def trainCounts(s: SparkSession, docs: DataFrame): Map[String, Long] = {
    import s.implicits._
    val wfDs = wordFreq(docs).as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      emLoop(seedDistributed(s, wfDs), probs => {
        val bc = s.sparkContext.broadcast(probs)
        val out = wfDs.flatMap { case (w, f) =>
          viterbi(w, bc.value).map(p => (p, f))
        }.groupBy("_1").agg(sum("_2").as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        bc.destroy()
        out
      })
    } finally wfDs.unpersist(false)
  }

  /** Registered trainer: final learned vocabulary with usage counts
    * and 1e-6-rounded probabilities, ordered facts as columns (driver
    * rows-only check; UnigramSpec carries correctness ≡ sequential).
    */
  def unigramTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = trainCounts(s, Tables.documents(s, d))
    val tot = counts.valuesIterator.sum.toDouble
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, math.floor(c / tot * 1e6 + 0.5) / 1e6) }
      .toDF("piece", "cnt", "p")
  }

  /** Registered encoder: Viterbi-segment the corpus under the learned
    * LM (per DISTINCT word, joined back to the token stream) and
    * report per-language compression — the unigram twin of
    * bpe_encode's census.
    */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = trainCounts(s, docs)
    val tot = counts.valuesIterator.sum.toDouble
    val probs = counts.map { case (p, c) => p -> round9(c / tot) }
    val bc = s.sparkContext.broadcast(probs)
    val wl = docs.select(col("lang"), explode(Dedup.tokensCol(col("text"))).as("w"))
    val perWord = wl.select("w").distinct().as[String]
      .map(w => (w, viterbi(w, bc.value).size))
      .toDF("w", "np")
    wl.join(perWord, "w")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum("np").as("n_pieces"),
        (floor(sum("np").cast("double") / count(lit(1)) * 10000 + 0.5) / 10000.0)
          .as("pieces_per_token"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "unigram_train" -> unigramTrain,
    "unigram_encode" -> unigramEncode)

  /** Float Viterbi argmax margins make a cross-engine hash flaky by
    * construction (SURVEY §2.4's pca reasoning) — both entries are
    * spec-certified, rows-only for the driver.
    */
  def oracleSql: Map[String, String] = Map.empty
}
