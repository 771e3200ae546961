package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable form of the [[ModelCache]] contract: trained artifacts
  * (factor tables, neighbor lists, split frames, merge lists — all
  * model-sized) persist as parquet under `spark.graft.modelDir`, so a
  * NEW session's serve entries warm-start from disk instead of
  * retraining. This is the serving contract a real deployment needs —
  * the session cache only helps while the training JVM lives.
  *
  * Layout: `<modelDir>/<name>_<md5(tableDir)>_<md5(constants)>/f<i>`
  * (one parquet dir per frame) plus a `_GRAFT_MODEL_OK` marker whose
  * content is the frame count. The marker is deleted before a
  * re-save and written LAST, so a crashed write never presents as a
  * complete model (the KvTextSink commit-marker convention). The
  * constants hash keys the model to the exact trainer configuration —
  * bumping a round count or learning rate invalidates the stored
  * artifact instead of silently serving a stale one.
  *
  * Paths go through the Hadoop FileSystem API, so `modelDir` may be
  * local, HDFS, or an object store — the same contract at 100 TB.
  * Everything stored is integer/md5-deterministic and parquet
  * round-trips longs/doubles/strings exactly, so a loaded model is
  * bit-identical to the trained one (oracle rows unchanged — spec'd
  * in FormatsSpec).
  *
  * Inactive (all methods no-op/None) when `spark.graft.modelDir` is
  * unset — the driver's Verify/Bench runs are unaffected unless
  * explicitly opted in.
  */
object ModelStore {

  def rootOf(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.modelDir").filter(_.nonEmpty)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def keyDir(root: String, d: String, name: String,
      constants: String): String =
    s"$root/${name}_${md5hex(d).take(12)}_${md5hex(constants).take(12)}"

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Persist `frames` for (`d`, `name`, `constants`). No-op when
    * modelDir is unset; best-effort otherwise (a failed save logs and
    * leaves no marker — the next load simply retrains).
    */
  def save(s: SparkSession, d: String, name: String, constants: String,
      frames: Seq[DataFrame]): Unit =
    rootOf(s).foreach { r =>
      try {
        val dir = keyDir(r, d, name, constants)
        val marker = new Path(dir, "_GRAFT_MODEL_OK")
        val fs = fsOf(s, marker)
        if (fs.exists(marker)) fs.delete(marker, false)
        frames.zipWithIndex.foreach { case (f, i) =>
          f.write.mode("overwrite").parquet(s"$dir/f$i")
        }
        val out = fs.create(marker, true)
        out.write(frames.size.toString.getBytes("UTF-8"))
        out.close()
      } catch { case e: Throwable =>
        System.err.println(s"[modelstore] save $name failed: $e")
      }
    }

  /** The stored frames for (`d`, `name`, `constants`) iff a COMPLETE
    * save (marker present, frame count matching) exists; None
    * otherwise (including when modelDir is unset).
    */
  def load(s: SparkSession, d: String, name: String, constants: String,
      n: Int): Option[Seq[DataFrame]] =
    rootOf(s).flatMap { r =>
      try {
        val dir = keyDir(r, d, name, constants)
        val marker = new Path(dir, "_GRAFT_MODEL_OK")
        val fs = fsOf(s, marker)
        if (!fs.exists(marker)) None
        else {
          val in = fs.open(marker)
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64)
          var k = in.read(tmp)
          while (k > 0) { buf.write(tmp, 0, k); k = in.read(tmp) }
          in.close()
          val content = buf.toString("UTF-8").trim
          if (content == n.toString)
            Some((0 until n).map(i => s.read.parquet(s"$dir/f$i")))
          else None
        }
      } catch { case e: Throwable =>
        System.err.println(s"[modelstore] load $name failed: $e"); None
      }
    }

  /** Observability for the cold-start measurement
    * (tools/ModelStoreCold): how many [[cachedDurable]] resolutions
    * that missed the session cache were served by the DISK store vs
    * retrained. JVM-wide monotone counters — the measurement tool
    * reads them to PROVE a fresh JVM warm-started from
    * `spark.graft.modelDir` rather than silently retraining.
    * AtomicLong, not volatile+`+=`: a read-modify-write under
    * concurrent resolutions would silently drop counts, and these
    * counters present as proof.
    */
  val diskHits = new java.util.concurrent.atomic.AtomicLong(0L)
  val retrains = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Get-or-train through BOTH tiers: session cache first, then the
    * disk store, then `train` (whose result is saved for the next
    * session). `fromFrames`/`toFrames` adapt the family's model type
    * to its stored frame list.
    */
  def cachedDurable[T <: AnyRef](s: SparkSession, d: String, name: String,
      constants: String, n: Int)(train: => T)(
      toFrames: T => Seq[DataFrame])(fromFrames: Seq[DataFrame] => T): T =
    ModelCache.cached(s, d, name) {
      load(s, d, name, constants, n).map { fs =>
        diskHits.incrementAndGet(); fromFrames(fs)
      }.getOrElse {
        retrains.incrementAndGet()
        val m = train
        save(s, d, name, constants, toFrames(m))
        m
      }
    }

  /** Trainer-side refresh of both tiers: always retrains (the caller
    * passes the freshly trained value), persists it, and replaces the
    * session cache entry.
    */
  def putDurable[T <: AnyRef](s: SparkSession, d: String, name: String,
      constants: String, value: T)(toFrames: T => Seq[DataFrame]): T = {
    save(s, d, name, constants, toFrames(value))
    ModelCache.put(s, d, name, value)
  }
}
