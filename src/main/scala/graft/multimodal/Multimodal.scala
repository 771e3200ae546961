package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata — the
  * multimodal column model for a training-data pipeline ([EXT]).
  * Image/audio/video bytes travel as `binary` columns; decode and
  * feature extraction run partition-batched on executors.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Int,
    width: Int,
    height: Int,
    channels: Int,
    embedding: Array[Float])

/** Multimodal plumbing with a STUBBED codec: the real decoders
  * (libjpeg/ffmpeg-style libs) are not in this container, so
  * [[decodeStub]] derives deterministic fake dimensions from the
  * bytes. Everything around the stub — schema, Dataset encoders,
  * partition-batched iteration (the mapInPandas batch shape),
  * frame sampling, the aggregation query — is real and tested.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is
  * a narrow mapPartitions stage; only the small typed features flow to
  * the aggregation. At 100 TB of media that's the invariant to keep:
  * shuffle features, never bytes.
  */
object Multimodal {

  /** Deterministic synthetic corpus: documents.text bytes stand in for
    * media payloads (media_type round-robins by doc_id).
    */
  def synthesize(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB — stands in for a real image/audio decoder. Deterministic
    * fake: dimensions derived from payload bytes. Replace with a real
    * codec call when the libraries exist on the cluster.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
    (64 + (h % 512).toInt.abs, 64 + ((h >> 9) % 512).toInt.abs, 1 + (h % 3).toInt.abs)
  }

  /** STUB frame sampler — every k-th 64-byte slice as a "frame". */
  def frameSampleStub(payload: Array[Byte], k: Int): Seq[Array[Byte]] =
    payload.grouped(64).zipWithIndex.collect {
      case (frame, i) if i % k == 0 => frame
    }.toSeq

  /** Partition-batched decode + feature extraction (the mapInPandas
    * shape: iterator of batches in, iterator of batches out — decoders
    * amortize per-batch setup; batchSize bounds executor memory).
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch "model load" would go here (amortized setup)
        batch.iterator.map { r =>
          val (w, h, c) = decodeStub(r.payload)
          val emb = Array.tabulate(8) { i =>
            val slice = r.payload.drop(i * 8).take(8)
            slice.foldLeft(0.0f)((a, b) => a + (b & 0xFF) / 255.0f)
          }
          MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, c, emb)
        }
      }
    }
  }

  /** Per-type feature stats — the rows-only registered query. */
  def multimodalStats(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(synthesize(graft.core.Tables.documents(s, d)))
    feats.toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("byte_len"), 2).as("avg_bytes"),
        round(avg("width"), 2).as("avg_width"),
        round(avg("height"), 2).as("avg_height"),
        round(avg(element_at(col("embedding"), 1)), 4).as("avg_feat0"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stats" -> multimodalStats)
}
