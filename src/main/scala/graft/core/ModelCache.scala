package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Session-scoped cache for TRAINED artifacts shared across registry
  * entries of one model family (MF factors, item-CF neighbor lists,
  * BPE merge lists). Train/serve registry pairs are self-contained by
  * contract — `mf_predict` must be runnable without `mf_train` having
  * run — but re-training inside every serving entry doubles the cost
  * of each model family and misrepresents the serve-path cost a real
  * user sees (they train once, then score). This cache keeps the
  * contract (cold cache ⇒ train on demand) while letting a session
  * that runs both entries pay for training exactly once.
  *
  * Keys carry the SparkContext applicationId: cached frames are
  * `.stable` (checkpoint-truncated) DataFrames whose blocks live in
  * THAT context — a new session must never see a dead frame. Values
  * are small by construction (factor tables, neighbor lists, merge
  * arrays — model-sized, not corpus-sized), so session-lifetime
  * retention is bounded the same way the repo's audited driver
  * collects are. Corpus-sized INPUT frames (ratings, interaction
  * tables) must NOT be cached here — serve entries rebuild them as
  * plain plans (exchange reuse dedups repeated reads within one
  * query) so the cache never pins corpus-scale storage.
  *
  * Storage hygiene: replacing or clearing an entry RELEASES the
  * evicted value's checkpoint blocks ([[Checkpoints.release]] walked
  * over any DataFrames inside it) — the bench runs every trainer
  * entry 4× per run (warm-up + 3 timed reps), and without eviction
  * each rep would leak the previous rep's blocks for the JVM
  * lifetime. Entries of stopped applications (stale applicationId)
  * are dropped lazily on the next access: Spark runs one context per
  * JVM, so a different appId proves the owning context is dead and
  * its blocks already gone.
  *
  * Determinism note: everything cached here is a pure function of
  * (dir, constants) — md5-seeded inits, fixed round counts — so a
  * cache hit returns bit-identical rows to a fresh train; the DuckDB
  * oracle rows are unchanged by construction.
  */
object ModelCache {
  private val m = new ConcurrentHashMap[String, AnyRef]()

  /** Unpersist every DataFrame reachable inside a cached value
    * (bare frame, tuple/case class of frames, an array, or a
    * collection). The Array arm matters: a cached Array[DataFrame]
    * is not a Product/Iterable, and a walk that misses it would
    * leave [[liveRddIds]] blind to its blocks — sweepLeakedBlocks
    * would then unpersist the only copy of a live model frame.
    */
  private def releaseValue(v: AnyRef): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] => Checkpoints.release(ds.toDF)
    case p: Product => p.productIterator.foreach {
      case r: AnyRef => releaseValue(r)
      case _ => ()
    }
    case a: Array[_] => a.foreach {
      case r: AnyRef => releaseValue(r)
      case _ => ()
    }
    case it: Iterable[_] => it.foreach {
      case r: AnyRef => releaseValue(r)
      case _ => ()
    }
    case _ => ()
  }

  /** Drop (without releasing — their context is stopped, blocks are
    * gone) entries whose applicationId differs from the live one.
    */
  private def pruneDead(appId: String): Unit = {
    val it = m.keySet.iterator
    while (it.hasNext) if (!it.next().startsWith(appId + "|")) it.remove()
  }

  /** Peek: the cached value if the live session already built it,
    * without building (callers that want a custom cold path).
    */
  def get[T <: AnyRef](s: SparkSession, d: String, name: String): Option[T] = {
    val appId = s.sparkContext.applicationId
    pruneDead(appId)
    Option(m.get(appId + "|" + d + "|" + name)).map(_.asInstanceOf[T])
  }

  /** Get-or-build `name` for table dir `d` in session `s`. The build
    * runs under the map's bin lock — callers are sequential registry
    * entries, so this only dedups, never blocks real concurrency.
    */
  def cached[T <: AnyRef](s: SparkSession, d: String, name: String)(build: => T): T = {
    val appId = s.sparkContext.applicationId
    pruneDead(appId)
    m.computeIfAbsent(appId + "|" + d + "|" + name, _ => build).asInstanceOf[T]
  }

  /** Unconditionally (re)store a freshly trained artifact. Trainer
    * entries call this so their OWN cost stays an honest measure of
    * training (they never skip work on a warm cache), while refreshing
    * what the serve entries reuse. The evicted value's checkpoint
    * blocks are released — retention is bounded to ONE live copy per
    * key no matter how many times a trainer reruns.
    *
    * `spark.graft.cacheNoRelease=true` (set by Verify's concurrent
    * dump) skips the release: under concurrent registry entries a
    * trainer's eviction could destroy checkpoint blocks a running
    * serve query still reads (truncated lineage ⇒ unrecoverable task
    * failure). A dump run executes each entry ONCE, so skipping
    * bounds the leak at one evicted model frame per family.
    */
  def put[T <: AnyRef](s: SparkSession, d: String, name: String, value: T): T = {
    val appId = s.sparkContext.applicationId
    pruneDead(appId)
    val old = m.put(appId + "|" + d + "|" + name, value)
    val noRelease =
      s.conf.getOption("spark.graft.cacheNoRelease").exists(_.toBoolean)
    if ((old ne null) && (old ne value) && !noRelease) releaseValue(old)
    value
  }

  /** Drop everything, releasing cached blocks (specs that need to
    * measure a cold path).
    */
  def clear(): Unit = {
    m.values.forEach(releaseValue(_))
    m.clear()
  }

  /** RDD ids backing every DataFrame reachable from a LIVE cached
    * value of `s`'s application. A bench-wide storage sweep
    * ([[sweepLeakedBlocks]]) must skip these: cached model frames are
    * checkpoint-truncated, so their blocks are the ONLY copy —
    * unpersisting one turns the next cache hit into a dead frame (no
    * lineage to recompute), which is exactly the r12 bench failure
    * mode this accessor exists to prevent. Stale entries are pruned
    * first (the get/cached/put convention): RDD ids are a PER-CONTEXT
    * counter, so a dead application's entry could otherwise exempt an
    * unrelated live RDD that happens to share its id.
    */
  def liveRddIds(s: SparkSession): Set[Int] = {
    pruneDead(s.sparkContext.applicationId)
    val acc = scala.collection.mutable.Set.empty[Int]
    def walk(v: AnyRef): Unit = v match {
      case ds: org.apache.spark.sql.Dataset[_] =>
        try ds.toDF.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD => acc += lr.rdd.id
          case _ => ()
        } catch { case _: Throwable => () }
      case p: Product => p.productIterator.foreach {
        case r: AnyRef => walk(r)
        case _ => ()
      }
      case a: Array[_] => a.foreach {
        case r: AnyRef => walk(r)
        case _ => ()
      }
      case it: Iterable[_] => it.foreach {
        case r: AnyRef => walk(r)
        case _ => ()
      }
      case _ => ()
    }
    m.values.forEach(walk(_))
    acc.toSet
  }

  /** Drop every leaked persisted block in `s`'s context EXCEPT those
    * backing live cache entries — the between-executions storage
    * hygiene Bench and the dev measurement tools share (one
    * implementation so the [[liveRddIds]] exemption cannot drift out
    * of a re-implemented sweep). Iterative/stage-shared operators
    * truncate lineage via localCheckpoint, whose blocks bypass
    * `Dataset.unpersist`/catalog cache and otherwise accumulate for
    * the JVM lifetime.
    */
  def sweepLeakedBlocks(s: SparkSession): Unit = {
    try s.catalog.clearCache() catch { case _: Throwable => () }
    val keep = try liveRddIds(s) catch { case _: Throwable => Set.empty[Int] }
    s.sparkContext.getPersistentRDDs.values.foreach { r =>
      if (!keep.contains(r.id))
        try r.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
