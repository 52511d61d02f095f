package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata (the LLM-pipeline extension surface).
  *
  * Design: media rows are `(id, payload: binary, meta: struct)`. Decode /
  * feature-extract run as `mapPartitions` over the typed Dataset — the
  * Scala analogue of a batched `mapInPandas` UDF: one decoder instance per
  * partition (amortized model/codec init), batch-shaped iteration, output
  * schema declared up front. The actual byte decoding is STUBBED
  * deterministically (`???`-equivalent: no image/audio codecs exist in
  * this environment); everything around it — schema, partitioning, the
  * per-partition batching contract — is real and tested by
  * `MultimodalSpec`.
  *
  * Scale notes: payloads never pass through a shuffle here (decode is a
  * narrow map); at 100 TB you repartition by size-balanced input files
  * before decode, and only the small metadata struct flows onward.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      format: String)
  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Wrap any table with a string column into a binary media table —
    * the ingestion shape for opaque payloads. */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), col(payloadCol).cast("binary").as("payload"))

  /** STUB image decode. A real build links an image codec here; the
    * deterministic fake derives dimensions from payload bytes so tests and
    * oracles stay reproducible. Runs once per partition (batch-shaped). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "decoder" init happens here (stubbed)
      rows.map { r =>
        val bytes = r.payload
        val h = bytes.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        MediaMeta(
          media_id = r.media_id,
          n_bytes = bytes.length,
          width = (h % 640L).toInt,
          height = (h % 480L).toInt,
          channels = 3,
          format = "stub")
      }
    }
  }

  /** STUB frame sampling (video analogue): every k-th "frame" emits a
    * deterministic content hash. Generator-shaped: one input row fans out
    * to n output rows, still a narrow map. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = math.max(r.payload.length / 64, 1)
      (0 until nFrames by everyK).map { i =>
        val slice = r.payload.slice(i * 64, i * 64 + 64)
        val h = slice.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        FrameSample(r.media_id, i, h)
      }
    }
  }

  /** STUB resize: returns a payload of the requested byte budget (real
    * impl would re-encode); keeps the binary-in/binary-out pipeline shape. */
  def resizePayload(spark: SparkSession, media: DataFrame, maxBytes: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .map(r => MediaRow(r.media_id, r.payload.take(maxBytes)))
      .toDF("media_id", "payload")
  }
}
