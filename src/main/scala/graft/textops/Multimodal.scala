package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in partition-sized batches.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * codecs): [[fakeDecodeFeatures]] derives a deterministic feature vector
 * from the raw bytes so the Spark-side contract — schema, partitioning,
 * batch shape, feature join — is real and tested. Swap the stub for a
 * JNI/codec call (or `mapInPandas`+PIL on the Python side) at deploy
 * time; nothing else changes.
 */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      url: String,
      media_type: String, // image | audio | video
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      sha: String,
      features: Array[Float])

  /** Deterministic synthetic media table derived from any id column —
   *  the payload is a seeded byte blob, standing in for WARC media. */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val rnd = new scala.util.Random(id * 7919L + 13L)
      val n = 256 + rnd.nextInt(768)
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      MediaRow(id, s"http://crawl.test/media/$id", mt, 32 + (id % 64).toInt, 32 + (id % 48).toInt, bytes)
    }
  }

  /**
   * STUB decode: a 16-dim feature vector from byte statistics —
   * deterministic, replaces the real `decode → resize → embed` kernel.
   * Runs per-partition so a real codec would amortize model init the
   * same way (the mapPartitions boundary IS the batch shape).
   */
  def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      f(i % 16) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(bytes.length / 16, 1)
    (0 until 16).foreach(j => f(j) /= n)
    f
  }

  /** Feature extraction over the binary column; mapPartitions keeps one
   *  "model" per task, mirroring a Pandas-UDF batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize decoder/model once per partition here
      it.map { m =>
        MediaFeatures(
          m.media_id, m.media_type, m.payload.length,
          graft.util.TextUtil.md5Hex(m.payload),
          fakeDecodeFeatures(m.payload))
      }
    }
  }

  /** Frame sampling contract for video payloads: every k-th chunk of the
   *  payload stands in for a frame; shape (media_id, frame_idx, frame). */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      m.payload.grouped(64).zipWithIndex.collect {
        case (chunk, i) if i % everyK == 0 => (m.media_id, i, chunk)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
