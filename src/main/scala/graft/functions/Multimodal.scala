package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashes

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode / feature-extract / resize /
  * frame-sample operators (builder prompt).
  *
  * The actual codecs are STUBBED — no image/audio libraries exist in this
  * container — with clearly-marked deterministic fakes, so the Spark-side
  * contract (schema, partition-sized batching, column pruning: metadata
  * selections never touch the fat bytes) is real and tested. Swapping a real
  * decoder in changes only the function bodies marked `STUB`. In PySpark the
  * same shape is `mapInPandas` over arrow batches; in Scala the idiomatic
  * equivalent used here is a typed `mapPartitions` that processes rows in
  * fixed-size batches.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. Keep metadata in plain
    * columns so pruning/pushdown works without reading `media`. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      // STUB decode output: 8-bin byte histogram as the stand-in for real
      // decoded features (embedding, spectrogram stats, …)
      features: Array[Double],
      content_hash: Long)

  /** Deterministic synthetic media table derived from any (id, text) corpus —
    * the payload is the utf-8 bytes re-hashed to a pseudo-binary blob. Stands
    * in for a real (id, media binary, meta) table; no external data. */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val seed = Hashes.xxh64(text)
      val kindIdx = math.floorMod(seed, 3L).toInt
      val kinds = Array("image", "audio", "video")
      val formats = Array("jpeg", "wav", "mp4")
      val rates = Array(0, 16000, 44100)
      val len = 256 + math.floorMod(Hashes.mix(seed, 1), 1024L).toInt
      val bytes = new Array[Byte](len)
      var i = 0
      while (i < len) { bytes(i) = (Hashes.mix(seed, 100 + i / 8) >>> ((i % 8) * 8)).toByte; i += 1 }
      MediaRow(id, kinds(kindIdx), bytes, formats(kindIdx),
        64 + math.floorMod(Hashes.mix(seed, 2), 512L).toInt,
        64 + math.floorMod(Hashes.mix(seed, 3), 512L).toInt,
        1 + math.floorMod(Hashes.mix(seed, 4), 120L).toInt,
        rates(kindIdx))
    }
  }

  /** STUB decode + feature extraction, batch-shaped: rows are processed in
    * fixed-size batches inside mapPartitions (the arrow-batch contract of
    * mapInPandas). A real build replaces `decodeBatch` with the codec call. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        decodeBatch(batch) // whole-batch call — the mapInPandas shape
      }
    }
  }

  /** STUB: deterministic fake "decode" — an 8-bin byte histogram normalized
    * to [0,1]. Real implementation would decode pixels/samples here. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val hist = new Array[Double](8)
      r.media.foreach(b => hist((b & 0xff) >> 5) += 1.0)
      val n = math.max(r.media.length, 1).toDouble
      MediaFeatures(r.media_id, r.kind, r.media.length,
        hist.map(_ / n),
        Hashes.mix(0L, r.media.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))))
    }

  /** STUB resize: truncate/pad payload to the target size deterministically;
    * metadata updated. Real build: image scaling. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val target = math.max(targetW * targetH / 64, 16)
      val bytes = java.util.Arrays.copyOf(r.media, target)
      r.copy(media = bytes, width = targetW, height = targetH)
    }
  }

  /** STUB frame sampling for videos: every `stride`-th 64-byte "frame" of the
    * payload becomes one output row. Real build: keyframe extraction. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").flatMap { r =>
      (0 until r.n_frames by stride).map { f =>
        val off = (f * 64) % math.max(r.media.length - 64, 1)
        val frame = java.util.Arrays.copyOfRange(r.media, off, off + 64)
        (r.media_id, f, frame)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
