package graft

import graft.queries.SeqMine
import org.apache.spark.sql.functions._

/** Sequence-mining contracts: supports equal brute-force subsequence
  * existence checks over every user stream (the greedy witness for
  * length 3 is exact for exists-semantics). Cross-engine hashes live
  * under the DuckDB gate.
  */
class SeqMineSpec extends SparkSuite {

  test("frequent_seq supports equal brute-force subsequence counting") {
    val streams = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      }
    val types = streams.values.flatten.toSet.toSeq.sorted
    val nUsers = streams.size.toLong
    def supports2(seq: Seq[String], a: String, b: String): Boolean = {
      val ia = seq.indexOf(a)
      ia >= 0 && seq.lastIndexOf(b) > ia
    }
    def supports3(seq: Seq[String], a: String, b: String, c: String): Boolean = {
      val ia = seq.indexOf(a)
      if (ia < 0) return false
      val ib = seq.indexWhere(_ == b, ia + 1)
      ib >= 0 && seq.lastIndexOf(c) > ib
    }
    // brute force (exists any i<j<k) must equal the greedy witness:
    // if any witness exists, the greedy one does
    def bruteforce3(seq: Seq[String], a: String, b: String, c: String): Boolean =
      seq.indices.exists(i => seq(i) == a &&
        (i + 1 until seq.length).exists(j => seq(j) == b &&
          (j + 1 until seq.length).exists(k => seq(k) == c)))
    val exp = scala.collection.mutable.Map.empty[(String, Long), Long]
    for (a <- types; b <- types) {
      val s2 = streams.values.count(supports2(_, a, b)).toLong
      if (s2 * 1000 >= nUsers * SeqMine.MinSupportPermille)
        exp((s"$a>$b", 2L)) = s2
      for (c <- types) {
        val s3 = streams.values.count(supports3(_, a, b, c)).toLong
        val s3bf = streams.values.count(bruteforce3(_, a, b, c)).toLong
        assert(s3 == s3bf, s"greedy != brute force for $a>$b>$c")
        if (s3 * 1000 >= nUsers * SeqMine.MinSupportPermille)
          exp((s"$a>$b>$c", 3L)) = s3
      }
    }
    val got = SeqMine.frequentSeq(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == exp.keySet,
      s"missing ${exp.keySet -- got.keySet}, extra ${got.keySet -- exp.keySet}")
    exp.foreach { case (k, s) =>
      assert(got(k) == ((s, s * 1000000L / nUsers)), s"seq $k")
    }
  }
}
