package graft

import graft.queries.{Preference, TextOps}
import org.apache.spark.sql.functions._

/** Preference-pair contracts: pairing is the exact mirror-rank join
  * over the quality ranking, every pair clears the margin floor, and
  * chosen strictly outranks rejected. Cross-engine hashes live under
  * the DuckDB gate.
  */
class PreferenceSpec extends SparkSuite {

  test("preference_pairs equals the mirror-rank pairing over quality") {
    val q = TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 10000 + 0.5).toLong)
      .toMap
    val src = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = src.groupBy(_._2).flatMap { case (s0, docs) =>
      val ranked = docs.keys.toSeq
        .sortBy(id => (-q(id), id))
      val n = ranked.length
      (0 until n).flatMap { k =>
        val rk = k + 1
        if (rk * 2 < n + 1) {
          val chosen = ranked(k); val rejected = ranked(n - rk)
          val margin = q(chosen) - q(rejected)
          if (margin >= Preference.MarginMinE4)
            Some((s0, rk.toLong) ->
              (chosen, rejected, q(chosen), q(rejected), margin))
          else None
        } else None
      }
    }
    val got = Preference.preferencePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == exp,
      s"missing ${exp.keySet -- got.keySet}, extra ${got.keySet -- exp.keySet}")
    assert(got.nonEmpty)
    got.values.foreach { case (_, _, qc, qr, m) =>
      assert(m == qc - qr && m >= Preference.MarginMinE4 && qc > qr)
    }
  }
}
