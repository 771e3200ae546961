package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries (frequent-items) summary: at most k counters
  * of token -> undercount, plus the total stream length n.
  *
  * This is the bounded-memory refinement of the heavy-hitter candidate
  * stage (see Sketches.heavyHitters): the per-partition hash-map
  * prefilter there is exact but its memory is the partition's distinct
  * vocabulary; this summary is O(k) REGARDLESS of vocabulary, so it
  * survives any partition sizing at 100 TB. The price is a bounded
  * undercount — each counter is below the true frequency by at most
  * n/(k+1) — which the verify pass pays back exactly.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
  * matching counters, then subtract the (k+1)-th largest count from
  * every counter and drop the non-positive ones. The combined summary
  * is again a valid MG summary of the concatenated stream, so the
  * aggregator is associative + commutative and Spark runs it as
  * map-side partial + final merge — the summary that crosses the
  * shuffle is k counters, never the vocabulary.
  *
  * `finish` keeps tokens whose undercount is still >= threshold -
  * n/(k+1): a token with TRUE count >= threshold cannot fall below
  * that, so the emitted candidate list is a guaranteed superset of the
  * true heavy hitters (spec: SketchesSpec).
  */
class MisraGriesAggregator(k: Int, threshold: Long)
  extends Aggregator[String, (Map[String, Long], Long), Seq[String]] {

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(buf: (Map[String, Long], Long), tok: String): (Map[String, Long], Long) = {
    val (m, n) = buf
    m.get(tok) match {
      case Some(c) => (m.updated(tok, c + 1L), n + 1L)
      case None if m.size < k => (m.updated(tok, 1L), n + 1L)
      case None =>
        // classic decrement step: O(k), but each unit of count it
        // destroys was paid for by one prior arrival => amortized O(1)
        val dec = m.iterator.collect { case (t, c) if c > 1L => (t, c - 1L) }.toMap
        (dec, n + 1L)
    }
  }

  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val summed = b._1.foldLeft(a._1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        summed.iterator.collect { case (t, c) if c > cut => (t, c - cut) }.toMap
      }
    (trimmed, a._2 + b._2)
  }

  override def finish(buf: (Map[String, Long], Long)): Seq[String] = {
    val (m, n) = buf
    val err = n / (k + 1L)
    // superset guarantee holds only while the undercount bound stays
    // below the threshold (k > n/threshold) — fail loudly, never
    // silently drop a true heavy hitter
    require(err < threshold,
      s"MisraGries k=$k too small for n=$n at threshold=$threshold (undercount bound $err)")
    m.iterator.collect { case (t, c) if c >= threshold - err => t }.toSeq.sorted
  }

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGriesAggregator {
  /** Typed-column form for a whole-dataset (single-group) aggregation. */
  def frequentCandidates(k: Int, threshold: Long): TypedColumn[String, Seq[String]] =
    new MisraGriesAggregator(k, threshold).toColumn
}

/** Share-based Misra-Gries: certify tokens with frequency >= share·n
  * of the stream seen SO FAR. The validity condition share > 1/(k+1)
  * is STATIC — checked once at construction, independent of n — so
  * unlike an absolute threshold this form can never outgrow its
  * counter budget on an unbounded stream: the right contract for
  * streaming ingestion, where n grows without bound by definition.
  * A token with true frequency >= share·n has a counter >=
  * share·n − n/(k+1), which is the emission bound.
  */
class MisraGriesShareAggregator(k: Int, share: Double)
  extends Aggregator[String, (Map[String, Long], Long), Seq[String]] {
  require(share > 1.0 / (k + 1),
    s"share $share must exceed 1/(k+1)=${1.0 / (k + 1)} for the superset guarantee")

  private val inner = new MisraGriesAggregator(k, Long.MaxValue)

  override def zero: (Map[String, Long], Long) = inner.zero
  override def reduce(b: (Map[String, Long], Long), t: String): (Map[String, Long], Long) =
    inner.reduce(b, t)
  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) =
    inner.merge(a, b)

  override def finish(buf: (Map[String, Long], Long)): Seq[String] = {
    val (m, n) = buf
    val bound = share * n - n.toDouble / (k + 1)
    m.iterator.collect { case (t, c) if c >= bound => t }.toSeq.sorted
  }

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGriesShareAggregator {
  def frequentCandidates(k: Int, share: Double): TypedColumn[String, Seq[String]] =
    new MisraGriesShareAggregator(k, share).toColumn
}
