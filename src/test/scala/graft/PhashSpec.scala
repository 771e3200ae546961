package graft

import graft.multimodal.Phash

/** dedup_phash contracts: the real PNG encode→decode→dHash path
  * equals a direct recompute from the pixel generator, the planted
  * variant groups collapse completely, and no cross-group pair
  * sneaks under the Hamming bound.
  */
class PhashSpec extends SparkSuite {

  private def refHash(id: Long): (Long, Long) = {
    var hi = 0L; var lo = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (Phash.gray(id, x + 1, y) > Phash.gray(id, x, y)) {
        val b = y * 8 + x
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
    (hi, lo)
  }

  test("PNG roundtrip: dhash(makePng(id)) equals the generator recompute") {
    (0L until 64L).foreach { id =>
      assert(Phash.dhash(Phash.makePng(id)) == refHash(id), s"doc $id")
    }
  }

  test("dedup_incremental_phash admits exactly the brand-new groups") {
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    def isBatch(id: Long) =
      (id % 4 == 3 && (id / 4) % 2 == 0) || (id / 4) % 5 == 3
    val expectAdmit = (0L until nDocs).filter(id =>
      isBatch(id) && (id / 4) % 5 == 3).toSet
    val got = graft.multimodal.Phash.dedupIncrementalPhash(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expectAdmit,
      "admitted set must be exactly the whole-new-group batch members")
    // the rejected remainder are retouches whose base group sits in
    // the corpus
    val rejected = (0L until nDocs).filter(isBatch).toSet -- got
    assert(rejected.forall(id => id % 4 == 3 && (id / 4) % 2 == 0))
    assert(rejected.nonEmpty && got.nonEmpty)
  }

  test("dedup_phash finds exactly the planted variant groups") {
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    val hs = (0L until nDocs).map(id => id -> refHash(id)).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val expect = (for {
      a <- 0L until nDocs; b <- (a + 1) until nDocs
      h = ham(hs(a), hs(b)) if h <= Phash.HammingMax
    } yield (a, b) -> h.toLong).toMap
    val got = Phash.dedupPhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // every 4-doc group fully collapses; nothing crosses groups
    assert(expect.keys.forall { case (a, b) => a / 4 == b / 4 },
      "cross-group pair under the Hamming bound")
    assert(expect.size == (nDocs / 4) * 6, "planted groups incomplete")
  }
}
