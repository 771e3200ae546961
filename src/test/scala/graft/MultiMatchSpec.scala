package graft

import org.apache.spark.sql.functions._
import graft.functions.AhoCorasick
import graft.queries.Blocklist

/** Aho-Corasick contracts: automaton counts equal the naive
  * every-start-position scan (overlaps, shared prefixes, patterns
  * inside patterns), the codegen'd expression equals direct
  * automaton eval, and blocklist_native reconciles with the
  * replace-and-measure twin on the non-self-overlapping registry
  * terms.
  */
class MultiMatchSpec extends SparkSuite {

  private def naive(text: String, p: String): Long =
    (1 to text.length - p.length + 1)
      .count(i => text.regionMatches(i - 1, p, 0, p.length)).toLong

  test("automaton equals the naive positional scan incl. overlaps") {
    val pats = Seq("aa", "aaa", "ab", "ba", "slow", "slow query", "query")
    val ac = new AhoCorasick(pats)
    val texts = Seq("aaaa", "abababa", "a slow query is slow", "", "aaab",
      "queryqueryquery", "slow slow query")
    texts.foreach { t =>
      val got = ac.counts(t).toSeq
      val want = pats.map(naive(t, _))
      assert(got == want, s"text '$t': $got != $want")
    }
    // the load-bearing overlap case: 3 'aa' in 'aaaa'
    assert(ac.counts("aaaa")(0) == 3L)
  }

  test("empty-string patterns are rejected at construction") {
    // an empty pattern would sit on the root node and "match" once
    // per scanned character — must fail loudly, not count nonsense
    intercept[IllegalArgumentException](new AhoCorasick(Seq("ok", "")))
  }

  test("codegen'd expression equals direct automaton eval") {
    val sess = spark
    import sess.implicits._
    val ac = new AhoCorasick(Blocklist.Terms)
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val viaExpr = docs.select(col("doc_id"),
        graft.functions.MultiMatch.countsCol(col("t"), Blocklist.Terms).as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    val direct = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> ac.counts(t).toSeq }.toMap
    assert(viaExpr == direct)
  }

  test("blocklist_native reconciles with blocklist_report (no self-overlapping terms)") {
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val native = toMap(Blocklist.blocklistNative(spark, sfDir))
    val report = toMap(Blocklist.blocklistReport(spark, sfDir))
    assert(native == report,
      "per-term counts should agree when no registry term self-overlaps")
  }
}
