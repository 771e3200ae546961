package graft

import graft.queries.Privacy

/** k-anonymity contracts: census partition, violation flags, and the
  * generalization invariants (mass conservation, monotone repair).
  */
class PrivacySpec extends SparkSuite {

  test("census partitions the table; violation flag matches class size") {
    val rows = Privacy.privacyKanon(spark, sfDir).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.core.Tables.customer(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getLong(2) < 10))
    }
    assert(rows.exists(_.getBoolean(3)), "thresholds must be live at this SF")
    // both flag kinds exist at the driver's sf0.01 gate; at this spec's
    // sf0.001 every class may violate (150 customers / 125 classes) —
    // only require the flags to be non-degenerate when possible
    if (rows.exists(_.getLong(2) >= 10)) assert(rows.exists(!_.getBoolean(3)))
  }

  test("generalization conserves mass and only merges violators") {
    val census = Privacy.privacyKanon(spark, sfDir).collect()
    val gen = Privacy.privacyKanonGeneralize(spark, sfDir).collect()
    assert(gen.map(_.getLong(2)).sum === census.map(_.getLong(2)).sum)
    gen.foreach { r =>
      val (seg, size, generalized, residual) =
        (r.getString(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))
      if (!generalized) {
        assert(seg != "*" && size >= 10 && !residual)
      } else {
        assert(seg === "*")
        assert(residual === (size < 10))
      }
    }
    // repaired classes count < original violating classes (merging happened)
    val nViol = census.count(_.getBoolean(3))
    val nMerged = gen.count(_.getBoolean(3))
    assert(nMerged <= nViol)
  }
}
