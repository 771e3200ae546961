package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Audio fingerprinting for the audio modality [EXT] — the
  * tone-signature analog of [[Phash]]: synthesize a deterministic
  * 16-bit PCM WAV per document (groups of 4 docs share a 3-tone
  * chord chosen by md5; variants add a quiet out-of-band hum), run
  * the REAL `javax.sound.sampled` encode→parse→PCM path, probe the
  * 12 bin-aligned frequencies with a direct DFT (integer cycle
  * counts in the 512-sample window → zero spectral leakage), and
  * emit the 12-bit above-mean-power fingerprint. Equal-fingerprint
  * groups are the duplicate clusters — re-encoded or slightly-mixed
  * audio collapses while different chords never match.
  *
  * No SQL engine parses WAV or does trig, so this is
  * spec-certified (the multimodal_stats class, SURVEY §2.4):
  * AudioFpSpec pins the decode path against direct synthesis, the
  * planted collapse, and hum-robustness.
  *
  * Scale shape: synthesis+decode+probe is one narrow map stage
  * (audio bytes never shuffle); the groupBy carries a 12-bit int.
  */
object AudioFp {

  val SampleRate = 8000
  val N = 512 // samples per clip
  val Probes = 12 // bins 32, 48, ... 208 — integer cycles in N

  private def probeBin(k: Int): Int = 32 + 16 * k

  /** md5-chosen 3-tone chord (probe indices) for a doc group. */
  def chord(gid: Long): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"aud:$gid".getBytes("UTF-8"))
    Seq(md(0) & 0xff, md(1) & 0xff, md(2) & 0xff).map(_ % Probes)
  }

  /** Deterministic PCM: 3 chord tones at full amplitude plus, for
    * variants 1–3, a quiet 150 Hz hum (out of band, −26 dB).
    */
  def pcm(docId: Long): Array[Short] = {
    val gid = docId / 4
    val variant = (docId % 4).toInt
    val tones = chord(gid)
    Array.tabulate(N) { i =>
      var v = 0.0
      tones.foreach { k =>
        v += 6000.0 * Math.sin(2.0 * Math.PI * probeBin(k) * i / N)
      }
      if (variant > 0)
        v += 300.0 * Math.sin(2.0 * Math.PI * 150.0 * i / SampleRate + variant)
      Math.max(Short.MinValue, Math.min(Short.MaxValue, Math.rint(v))).toShort
    }
  }

  /** Real WAV container via javax.sound (16-bit signed LE mono). */
  def makeWav(docId: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](N * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pcm(docId).foreach(bb.putShort)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, N.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real WAV parse back to PCM samples. */
  def decodePcm(wav: Array[Byte]): Array[Short] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val raw = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(raw.length / 2)(bb.getShort)
  }

  /** 12-bit fingerprint: DFT power at each probe bin, bit set when
    * above the mean probe power.
    */
  def fingerprint(samples: Array[Short]): Int = {
    val powers = (0 until Probes).map { k =>
      val m = probeBin(k)
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < samples.length) {
        val ang = 2.0 * Math.PI * m * i / N
        re += samples(i) * Math.cos(ang)
        im -= samples(i) * Math.sin(ang)
        i += 1
      }
      re * re + im * im
    }
    val mean = powers.sum / Probes
    powers.indices.foldLeft(0)((acc, k) =>
      if (powers(k) > mean) acc | (1 << k) else acc)
  }

  /** Duplicate-audio census: one row per fingerprint with the member
    * count and keeper (min doc_id) — the dedup_url output contract
    * for the audio modality, through the real WAV path.
    */
  def dedupAudioFp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => (id, makeWav(id))) // binary payload stage (narrow)
      .mapPartitions(_.map { case (id, wav) =>
        (id, fingerprint(decodePcm(wav)))
      })
      .toDF("doc_id", "fp")
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_audio_fp" -> dedupAudioFp)

  /** Not SQL-expressible (WAV parsing + trig) — rows-only for the
    * driver, accuracy in AudioFpSpec.
    */
  def oracleSql: Map[String, String] = Map.empty
}
