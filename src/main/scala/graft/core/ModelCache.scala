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
  * collects are.
  *
  * Determinism note: everything cached here is a pure function of
  * (dir, constants) — md5-seeded inits, fixed round counts — so a
  * cache hit returns bit-identical rows to a fresh train; the DuckDB
  * oracle rows are unchanged by construction.
  */
object ModelCache {
  private val m = new ConcurrentHashMap[String, AnyRef]()

  /** Get-or-build `name` for table dir `d` in session `s`. The build
    * runs under the map's bin lock — callers are sequential registry
    * entries, so this only dedups, never blocks real concurrency.
    */
  def cached[T <: AnyRef](s: SparkSession, d: String, name: String)(build: => T): T =
    m.computeIfAbsent(s.sparkContext.applicationId + "|" + d + "|" + name,
      _ => build).asInstanceOf[T]

  /** Unconditionally (re)store a freshly trained artifact. Trainer
    * entries call this so their OWN cost stays an honest measure of
    * training (they never skip work on a warm cache), while refreshing
    * what the serve entries reuse. Evicted values are simply dropped —
    * they are model-sized and the md5-seeded determinism makes the
    * replacement bit-identical anyway.
    */
  def put[T <: AnyRef](s: SparkSession, d: String, name: String, value: T): T = {
    m.put(s.sparkContext.applicationId + "|" + d + "|" + name, value)
    value
  }

  /** Drop everything (specs that need to measure a cold path). */
  def clear(): Unit = m.clear()
}
