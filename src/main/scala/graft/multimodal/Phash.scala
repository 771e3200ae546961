package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Perceptual-hash (dHash) near-duplicate detection for the image
  * modality [EXT] — the content-level companion to byte-exact media
  * dedup: re-encoded / slightly-retouched images share a dHash band
  * even though their bytes differ.
  *
  * The corpus has no real images, so the operator SYNTHESIZES one
  * deterministic 9×8 grayscale PNG per document (groups of 4 docs
  * share a base pattern; variants 1–3 perturb one pixel — the
  * "same image, small retouch" plant), and then runs the REAL
  * pipeline on the bytes: `javax.imageio` PNG decode → raster
  * samples → 64-bit horizontal-gradient dHash (bit y·8+x set iff
  * gray(x+1,y) > gray(x,y)) → 8×8-bit band blocking → in-band
  * pairing → Hamming filter. The 9×8 canvas IS the dHash sampling
  * grid, so the hash is also a pure integer function of doc_id —
  * which is exactly what the DuckDB oracle recomputes
  * arithmetically. A hash mismatch anywhere in the PNG
  * encode→decode→raster path breaks the oracle row, so the gate
  * certifies the real imaging path, not just the SQL.
  *
  * The hash is carried as two 32-bit halves (h_hi, h_lo) — no
  * sign-bit games in either engine. Banding is complete for
  * Hamming ≤ 7 by pigeonhole (8 disjoint 8-bit bands).
  *
  * Scale shape: synthesis+decode+hash is one narrow map stage
  * (bytes never shuffle — the multimodal invariant); the shuffle
  * carries (band, byte, id, two ints); in-band pairing follows true
  * collision density like every LSH family here. Pairs are deduped
  * AFTER the cheap popcount, fuzzy_join_lev's ordering argument.
  */
object Phash {

  val HammingMax = 7
  private val W = 9
  private val H = 8

  /** Deterministic gray value at (x, y) for doc_id — base pattern per
    * doc group (doc_id DIV 4), one perturbed pixel per variant.
    */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def gray(docId: Long, x: Int, y: Int): Int = {
    val gid = docId / 4
    val variant = (docId % 4).toInt
    val d = md5.get(); d.reset()
    val md = d.digest(s"img:$gid:$x:$y".getBytes("UTF-8"))
    // first 4 hex chars = top 2 bytes — the repo's md5-randomness rule
    val v = (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % 256
    if (variant > 0 && x == variant && y == variant) (v + 64) % 256 else v
  }

  /** 9×8 grayscale PNG with [[gray]] samples. */
  def makePng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) { raster.setSample(x, y, 0, gray(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** dHash of a decoded 9×8 gray image, as (hi32, lo32). */
  def dhash(png: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null && img.getWidth == W && img.getHeight == H,
      "synthetic PNG failed to decode")
    val r = img.getRaster
    var hi = 0L; var lo = 0L
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W - 1) {
        if (r.getSample(x + 1, y, 0) > r.getSample(x, y, 0)) {
          val b = y * 8 + x
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** doc_id, h_hi, h_lo — through the real PNG bytes. */
  private def hashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => (id, makePng(id))) // binary payload stage (narrow)
      .mapPartitions(_.map { case (id, png) =>
        val (hi, lo) = dhash(png); (id, hi, lo)
      })
      .toDF("doc_id", "h_hi", "h_lo")
  }

  /** Near-duplicate image pairs: id_a < id_b, hamming ≤ [[HammingMax]],
    * found via 8-band byte blocking.
    */
  def dedupPhash(s: SparkSession, d: String): DataFrame = {
    import graft.core.Checkpoints.StableOps
    // the hash frame feeds BOTH join sides — without .stable the
    // synthesize+encode+decode pipeline runs twice (the repo's
    // read-twice rule); the frame is 3 longs per doc
    val h = hashes(s, d).stable
    val banded = h.select(col("doc_id"), col("h_hi"), col("h_lo"),
      explode(expr(
        """array(
          |  named_struct('k', 0, 'bv', shiftright(h_lo, 0)  & 255),
          |  named_struct('k', 1, 'bv', shiftright(h_lo, 8)  & 255),
          |  named_struct('k', 2, 'bv', shiftright(h_lo, 16) & 255),
          |  named_struct('k', 3, 'bv', shiftright(h_lo, 24) & 255),
          |  named_struct('k', 4, 'bv', shiftright(h_hi, 0)  & 255),
          |  named_struct('k', 5, 'bv', shiftright(h_hi, 8)  & 255),
          |  named_struct('k', 6, 'bv', shiftright(h_hi, 16) & 255),
          |  named_struct('k', 7, 'bv', shiftright(h_hi, 24) & 255))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("h_hi"), col("h_lo"),
        col("b.k").as("k"), col("b.bv").as("bv"))
    val other = banded.select(col("doc_id").as("doc_id_b"),
      col("h_hi").as("hi_b"), col("h_lo").as("lo_b"),
      col("k"), col("bv"))
    banded.join(other, Seq("k", "bv"))
      .filter(col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("id_a"), col("doc_id_b").as("id_b"),
        (expr("bit_count(h_hi ^ hi_b)") + expr("bit_count(h_lo ^ lo_b)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .distinct()
  }

  /** INCREMENTAL image ingest — the dedup_incremental contract for
    * the image modality: the arriving batch mixes late RETOUCHES of
    * already-indexed images (variant-3 docs of even groups — must be
    * rejected) with BRAND-NEW image groups (group id ≡ 3 mod 5 —
    * must be admitted); a batch image is admitted only if no corpus
    * image sits within [[HammingMax]] of its dHash. Candidate
    * generation is the same 8-band blocking, CROSS-side only (batch
    * bands join corpus bands — never batch×batch), so ingest cost
    * follows the batch size, not the corpus; intra-batch dedup
    * remains [[dedupPhash]]'s job, per the dedup_incremental
    * convention. Output: admitted doc_id with its hash halves.
    */
  def dedupIncrementalPhash(s: SparkSession, d: String): DataFrame = {
    import graft.core.Checkpoints.StableOps
    val h = hashes(s, d).stable
    def banded(side: DataFrame) = side.select(col("doc_id"), col("h_hi"), col("h_lo"),
      explode(expr(
        """array(
          |  named_struct('k', 0, 'bv', shiftright(h_lo, 0)  & 255),
          |  named_struct('k', 1, 'bv', shiftright(h_lo, 8)  & 255),
          |  named_struct('k', 2, 'bv', shiftright(h_lo, 16) & 255),
          |  named_struct('k', 3, 'bv', shiftright(h_lo, 24) & 255),
          |  named_struct('k', 4, 'bv', shiftright(h_hi, 0)  & 255),
          |  named_struct('k', 5, 'bv', shiftright(h_hi, 8)  & 255),
          |  named_struct('k', 6, 'bv', shiftright(h_hi, 16) & 255),
          |  named_struct('k', 7, 'bv', shiftright(h_hi, 24) & 255))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("h_hi"), col("h_lo"),
        col("b.k").as("k"), col("b.bv").as("bv"))
    val isBatch = expr(
      "(doc_id % 4 = 3 AND (doc_id DIV 4) % 2 = 0) OR (doc_id DIV 4) % 5 = 3")
    val batch = banded(h.filter(isBatch))
    val corpus = banded(h.filter(!isBatch))
      .select(col("doc_id").as("cid"), col("h_hi").as("hi_c"),
        col("h_lo").as("lo_c"), col("k"), col("bv"))
    val dup = batch.join(corpus, Seq("k", "bv"))
      .filter(expr("bit_count(h_hi ^ hi_c) + bit_count(h_lo ^ lo_c)")
        <= HammingMax)
      .select(col("doc_id")).distinct()
    h.filter(isBatch)
      .join(dup, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("h_hi"), col("h_lo"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_phash" -> dedupPhash,
    "dedup_incremental_phash" -> dedupIncrementalPhash)

  def oracleSql: Map[String, String] = Map(
    "dedup_incremental_phash" ->
      s"""WITH g AS (
         |  SELECT d.doc_id, x.x, y.y,
         |    CASE WHEN d.doc_id % 4 > 0
         |              AND x.x = d.doc_id % 4 AND y.y = d.doc_id % 4
         |      THEN (CAST(('0x' || substr(md5('img:' || (d.doc_id // 4)
         |               || ':' || x.x || ':' || y.y), 1, 4)) AS UBIGINT)
         |            % 256 + 64) % 256
         |      ELSE CAST(('0x' || substr(md5('img:' || (d.doc_id // 4)
         |               || ':' || x.x || ':' || y.y), 1, 4)) AS UBIGINT)
         |           % 256
         |    END AS v
         |  FROM documents d, generate_series(0, ${W - 1}) AS x(x),
         |       generate_series(0, ${H - 1}) AS y(y)),
         |bits AS (
         |  SELECT a.doc_id, a.y * 8 + a.x AS b
         |  FROM g a JOIN g b2
         |    ON b2.doc_id = a.doc_id AND b2.y = a.y AND b2.x = a.x + 1
         |  WHERE a.x < 8 AND b2.v > a.v),
         |h AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(sum(CASE WHEN b >= 32
         |      THEN 1::BIGINT << (b - 32) END), 0) AS BIGINT) AS h_hi,
         |    CAST(coalesce(sum(CASE WHEN b < 32
         |      THEN 1::BIGINT << b END), 0) AS BIGINT) AS h_lo
         |  FROM documents d LEFT JOIN bits ON bits.doc_id = d.doc_id
         |  GROUP BY d.doc_id),
         |batch AS (SELECT * FROM h
         |          WHERE (doc_id % 4 = 3 AND (doc_id // 4) % 2 = 0)
         |             OR (doc_id // 4) % 5 = 3),
         |corpus AS (SELECT * FROM h
         |           WHERE NOT ((doc_id % 4 = 3 AND (doc_id // 4) % 2 = 0)
         |                      OR (doc_id // 4) % 5 = 3)),
         |dup AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM batch b JOIN corpus c
         |    ON bit_count(xor(b.h_hi, c.h_hi))
         |     + bit_count(xor(b.h_lo, c.h_lo)) <= $HammingMax)
         |SELECT b.doc_id, b.h_hi, b.h_lo
         |FROM batch b LEFT JOIN dup ON dup.doc_id = b.doc_id
         |WHERE dup.doc_id IS NULL""".stripMargin,
    "dedup_phash" ->
      s"""WITH g AS (
         |  SELECT d.doc_id, x.x, y.y,
         |    CASE WHEN d.doc_id % 4 > 0
         |              AND x.x = d.doc_id % 4 AND y.y = d.doc_id % 4
         |      THEN (CAST(('0x' || substr(md5('img:' || (d.doc_id // 4)
         |               || ':' || x.x || ':' || y.y), 1, 4)) AS UBIGINT)
         |            % 256 + 64) % 256
         |      ELSE CAST(('0x' || substr(md5('img:' || (d.doc_id // 4)
         |               || ':' || x.x || ':' || y.y), 1, 4)) AS UBIGINT)
         |           % 256
         |    END AS v
         |  FROM documents d, generate_series(0, ${W - 1}) AS x(x),
         |       generate_series(0, ${H - 1}) AS y(y)),
         |bits AS (
         |  SELECT a.doc_id, a.y * 8 + a.x AS b
         |  FROM g a JOIN g b2
         |    ON b2.doc_id = a.doc_id AND b2.y = a.y AND b2.x = a.x + 1
         |  WHERE a.x < 8 AND b2.v > a.v),
         |h AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(sum(CASE WHEN b >= 32
         |      THEN 1::BIGINT << (b - 32) END), 0) AS BIGINT) AS h_hi,
         |    CAST(coalesce(sum(CASE WHEN b < 32
         |      THEN 1::BIGINT << b END), 0) AS BIGINT) AS h_lo
         |  FROM documents d LEFT JOIN bits ON bits.doc_id = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.h_hi, b.h_hi))
         |     + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h_hi, b.h_hi))
         |    + bit_count(xor(a.h_lo, b.h_lo)) <= $HammingMax""".stripMargin)
}
