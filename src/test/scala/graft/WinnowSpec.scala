package graft

import graft.queries.Winnow
import java.security.MessageDigest

/** Winnowing contracts: the SIGMOD'03 coverage guarantee (every full
  * w-window elects a fingerprint), an exact sequential recompute of
  * the rightmost-min rule, and the pair stage's score envelope. The
  * cross-engine value check lives under the driver's DuckDB gate.
  */
class WinnowSpec extends SparkSuite {

  private val K = 3
  private val W = 4

  private def md5_48(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  /** Sequential reference: rightmost min per full window, distinct. */
  private def winnowRef(text: String): Set[(Long, Long)] = {
    val w = text.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (w.length < K) return Set.empty
    val hs = (0 to w.length - K).map(i => md5_48(w.slice(i, i + K).mkString(" ")))
    (0 to hs.length - W).flatMap { j =>
      val win = hs.slice(j, j + W)
      val mn = win.min
      val right = (j until j + W).filter(p => hs(p) == mn).max
      Some(((right + 1).toLong, mn)) // 1-based positions
    }.toSet
  }

  test("every full window contains a selected fingerprint (coverage guarantee)") {
    val sel = Winnow.fingerprintWinnow(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).sorted }
    assert(sel.nonEmpty)
    sel.foreach { case (doc, ps) =>
      assert(ps.head <= W, s"doc $doc: first selection ${ps.head} misses window 1")
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b - a <= W, s"doc $doc: gap $a→$b exceeds window size $W")
      }
    }
  }

  test("selection matches the sequential rightmost-min reference exactly") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().take(40)
    val got = Winnow.fingerprintWinnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val exp = winnowRef(text)
      val g = got.getOrElse(id, Array.empty).map(t => (t._2, t._3)).toSet
      assert(g === exp, s"doc $id winnow mismatch")
    }
  }

  test("native winnow_select ≡ windowed form, row for row, on a map-only plan") {
    val native = Winnow.fingerprintWinnowNative(spark, sfDir)
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"native winnow must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"native winnow must not use window exec:\n$plan")
    val a = native.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Winnow.fingerprintWinnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("dedup_winnow: scores in (0,1], floor respected, total order") {
    val rows = Winnow.dedupWinnow(spark, sfDir).collect()
    assert(rows.nonEmpty, "synthetic corpus shares vocabulary; expect pairs")
    rows.foreach { r =>
      assert(r.getLong(2) >= 3) // common >= MinCommon
      val ov = r.getDouble(3)
      assert(ov > 0 && ov <= 1.0)
    }
    val ovs = rows.map(_.getDouble(3))
    assert(ovs.zip(ovs.tail).forall { case (a, b) => a >= b }, "not sorted")
  }
}
