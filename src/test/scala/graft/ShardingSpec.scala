package graft

import graft.queries.Sharding

/** Size-balanced sharding: round-robin over the size-sorted corpus
  * must balance shard byte totals far better than count-balancing
  * alone, stay deterministic across runs, and cover every doc once.
  */
class ShardingSpec extends SparkSuite {

  test("shard totals balance within one max-doc of each other") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val maxDoc = docs.agg(org.apache.spark.sql.functions.max("n_chars"))
      .head().getLong(0)
    val rows = Sharding.shardPack(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === Sharding.NumShards)
    assert(rows.map(_._2).sum === docs.count())
    val totals = rows.map(_._3)
    // round-robin over desc-sorted sizes: spread bounded by the largest doc
    assert(totals.max - totals.min <= maxDoc,
      s"imbalance ${totals.max - totals.min} > max doc $maxDoc")
  }

  test("assignment is deterministic across runs") {
    def snap() = Sharding.shardAssignments(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(snap() === snap())
  }
}
