package graft

import graft.core.ModelCache
import graft.queries.{Mf, Recommend, Tokenize, Wordpiece}

/** Train-once/serve-many contracts: the session model cache dedups
  * builds per (session, dir, name), trainer entries refresh it, and a
  * warm serve entry returns bit-identical rows to a cold one (the
  * md5-seeded determinism the oracle gate relies on).
  */
class ModelCacheSpec extends SparkSuite {

  test("cached builds once per key; put refreshes; dirs don't collide") {
    ModelCache.clear()
    var builds = 0
    def b(): AnyRef = { builds += 1; new Object }
    val a1 = ModelCache.cached(spark, "/x", "m")(b())
    val a2 = ModelCache.cached(spark, "/x", "m")(b())
    assert((a1 eq a2) && builds == 1)
    val fresh = new Object
    ModelCache.put(spark, "/x", "m", fresh)
    assert(ModelCache.cached(spark, "/x", "m")(b()) eq fresh)
    assert(builds == 1, "a put-refreshed key must not rebuild")
    assert(!(ModelCache.cached(spark, "/y", "m")(b()) eq fresh))
    ModelCache.clear()
  }

  test("warm serve entries return the cold entries' exact rows") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    ModelCache.clear()
    // cold: each serve entry trains on demand (self-containment)
    val coldPredict = rows(Mf.mfPredict(spark, sfDir))
    val coldRec = rows(Recommend.itemRecommend(spark, sfDir))
    val coldWp = rows(Wordpiece.wordpieceEncode(spark, sfDir))
    assert(coldPredict.nonEmpty && coldRec.nonEmpty && coldWp.nonEmpty)
    // trainers always retrain and refresh the cache
    Mf.mfTrain(spark, sfDir).count()
    Recommend.itemCf(spark, sfDir).count()
    Tokenize.bpeTrain(spark, sfDir).count()
    // warm: serve entries ride the refreshed artifacts — same rows
    assert(rows(Mf.mfPredict(spark, sfDir)) == coldPredict)
    assert(rows(Recommend.itemRecommend(spark, sfDir)) == coldRec)
    assert(rows(Wordpiece.wordpieceEncode(spark, sfDir)) == coldWp)
  }

  test("put and clear release the evicted values' checkpoint blocks") {
    import graft.core.Checkpoints.StableOps
    import org.apache.spark.storage.StorageLevel
    def ckptRdd(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.head
    ModelCache.clear()
    // bare frame: replaced value's localCheckpoint blocks are freed
    val df1 = spark.range(16).toDF("x").stable
    assert(ckptRdd(df1).getStorageLevel != StorageLevel.NONE,
      "stable frames start persisted")
    ModelCache.put(spark, "/x", "rel", df1)
    val df2 = spark.range(16).toDF("x").stable
    ModelCache.put(spark, "/x", "rel", df2)
    assert(ckptRdd(df1).getStorageLevel == StorageLevel.NONE,
      "eviction must unpersist the replaced frame's checkpoint RDD")
    assert(ckptRdd(df2).getStorageLevel != StorageLevel.NONE,
      "the live entry stays persisted")
    // tuple values: every frame inside the evicted product is walked
    val ta = spark.range(8).toDF("a").stable
    val tb = spark.range(8).toDF("b").stable
    ModelCache.put(spark, "/x", "tup", (ta, tb))
    ModelCache.put(spark, "/x", "tup",
      (spark.range(8).toDF("a").stable, spark.range(8).toDF("b").stable))
    assert(ckptRdd(ta).getStorageLevel == StorageLevel.NONE)
    assert(ckptRdd(tb).getStorageLevel == StorageLevel.NONE)
    // clear() releases everything still held
    ModelCache.clear()
    assert(ckptRdd(df2).getStorageLevel == StorageLevel.NONE,
      "clear must release cached frames")
  }

  /** The r12 bench regression in miniature: Bench.clean sweeps leaked
    * localCheckpoint blocks between query executions, but cached model
    * frames are checkpoint-truncated — their blocks are the ONLY copy.
    * The sweep must honor [[ModelCache.liveRddIds]], and a serve entry
    * re-run after the sweep must ride the surviving cache entry and
    * return identical rows (the exact path that crashed 9 bench
    * queries when the first sweep dropped everything).
    */
  test("a liveRddIds-respecting storage sweep keeps warm serve entries alive") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    ModelCache.clear()
    val cold = rows(Mf.mfPredict(spark, sfDir)) // trains + caches factors
    val keep = ModelCache.liveRddIds(spark)
    assert(keep.nonEmpty,
      "the trained factor frames must surface their checkpoint RDD ids")
    // THE shared sweep (Bench.clean / WallScale delegate here)
    ModelCache.sweepLeakedBlocks(spark)
    // cache hit over swept storage: must not die, must not drift
    assert(rows(Mf.mfPredict(spark, sfDir)) == cold)
    // control: the exemption is load-bearing for BLOCK-backed entries.
    // MF's own factors now ride reliable checkpoint FILES (stableLoop,
    // r14 — sweep-immune by construction), so the control plants a
    // .stable (localCheckpoint) cache entry explicitly: its blocks are
    // the class a blanket sweep would have dropped.
    import graft.core.Checkpoints.StableOps
    import org.apache.spark.storage.StorageLevel
    def ckptRdd(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.head
    val blockBacked = spark.range(32).toDF("x").stable
    ModelCache.put(spark, "/x", "block", blockBacked)
    assert(ckptRdd(blockBacked).getStorageLevel != StorageLevel.NONE,
      "a .stable cache entry must live in persistent storage (else this control guards nothing)")
    val leaked = spark.range(32).toDF("y").stable // NOT cached
    ModelCache.sweepLeakedBlocks(spark)
    assert(ckptRdd(blockBacked).getStorageLevel != StorageLevel.NONE,
      "the sweep must exempt block-backed live cache entries")
    assert(ckptRdd(leaked).getStorageLevel == StorageLevel.NONE,
      "the sweep must drop non-exempt leaked blocks")
    ModelCache.clear()
  }
}
