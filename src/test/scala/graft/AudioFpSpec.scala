package graft

import graft.multimodal.AudioFp

/** dedup_audio_fp contracts: the WAV encode→parse→PCM path is
  * lossless, fingerprints are hum-robust within a doc group, the
  * fingerprint is exactly the chord bits, and the census collapses
  * the planted groups.
  */
class AudioFpSpec extends SparkSuite {

  test("WAV roundtrip is lossless and fingerprint equals the chord bits") {
    (0L until 32L).foreach { id =>
      val direct = AudioFp.pcm(id)
      val decoded = AudioFp.decodePcm(AudioFp.makeWav(id))
      assert(decoded.toSeq == direct.toSeq, s"doc $id PCM roundtrip")
      val fp = AudioFp.fingerprint(decoded)
      val want = AudioFp.chord(id / 4).foldLeft(0)((a, k) => a | (1 << k))
      assert(fp == want, s"doc $id fp ${fp.toBinaryString} != chord ${want.toBinaryString}")
    }
  }

  test("dedup_audio_fp collapses the planted groups through the real path") {
    val rows = AudioFp.dedupAudioFp(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2._1).sum == nDocs, "census covers every doc")
    // every group of 4 shares one fingerprint: cluster count is the
    // number of DISTINCT chords among the doc groups
    val distinctChords = (0L until nDocs / 4)
      .map(g => AudioFp.chord(g).distinct.sorted).distinct.size
    assert(rows.length == distinctChords,
      s"${rows.length} clusters != $distinctChords distinct chords")
    // keeper is the min doc of the merged chord groups
    rows.foreach { case (fp, (n, keeper)) =>
      assert(n % 4 == 0, s"fp $fp group size $n not whole doc-groups")
      assert(keeper % 4 == 0, s"fp $fp keeper $keeper not a group base")
    }
  }
}
