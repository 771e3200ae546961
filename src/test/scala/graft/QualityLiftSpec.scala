package graft

import org.apache.spark.sql.functions._
import graft.queries.{Cluster, QualityLift, TextOps}

/** dedup_quality_lift contracts: the two sides partition the corpus,
  * the kept side equals dedup_keep's survivor count, and the
  * ingredient ratios equal a sequential integer recompute.
  */
class QualityLiftSpec extends SparkSuite {

  test("dedup_quality_lift partitions the corpus and matches the sequential ratios") {
    val keep = Cluster.dedupKeep(spark, sfDir).collect().map(_.getLong(0)).toSet
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stops = TextOps.StopwordsPub.toSet
    val expect = docs.groupBy(d => if (keep(d._1)) 1L else 0L).map { case (k, ds) =>
      val chars = ds.map(_._2.length.toLong).sum
      val punct = ds.map(_._2.replaceAll("[\\p{L}\\p{N}\\s]", "").length.toLong).sum
      val toks = ds.map(d => "[^\\p{L}]+".r.split(d._2).count(_.nonEmpty).toLong).sum
      val stop = ds.map(d =>
        "[^\\p{L}]+".r.split(d._2).count(w => w.nonEmpty && stops(w)).toLong).sum
      k -> (ds.length.toLong, toks * 1000000L / ds.length,
        stop * 1000000L / toks, punct * 1000000L / chars)
    }
    val got = QualityLift.dedupQualityLift(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    assert(got(1L)._1 == keep.size.toLong)
    assert(got(0L)._1 + got(1L)._1 == docs.length.toLong)
  }
}
