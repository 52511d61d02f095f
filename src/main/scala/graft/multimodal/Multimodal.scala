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
  * schema declared up front. IMAGE decode is real: payloads whose magic
  * bytes identify PNG/JPEG/GIF/BMP go through `javax.imageio` (ships with
  * the JDK, no external codec needed). Non-image payloads fall back to a
  * deterministic stub (audio/video codecs do not exist in this
  * environment), keeping tests and oracles reproducible.
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

  /** Sniff the payload's container format from its magic bytes. Returns
    * None for anything `javax.imageio` cannot decode. */
  private[multimodal] def sniffImageFormat(b: Array[Byte]): Option[String] = {
    def at(i: Int) = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') Some("png")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') Some("gif")
    else if (at(0) == 'B' && at(1) == 'M') Some("bmp")
    else None
  }

  /** Image decode: real `javax.imageio` for PNG/JPEG/GIF/BMP payloads;
    * deterministic stub for everything else (no audio/video codecs in this
    * environment — the stub derives dimensions from payload bytes so tests
    * and oracles stay reproducible). Runs per partition (batch-shaped):
    * ImageIO's plugin registry lookup is amortized across the partition. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // Per-partition decoder init: resolving ImageIO readers per row would
      // re-scan the plugin registry; per-partition, it's paid once.
      javax.imageio.ImageIO.setUseCache(false) // no temp-file spooling for byte streams
      rows.map { r =>
        val bytes = r.payload
        val decoded = sniffImageFormat(bytes).flatMap { fmt =>
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            .map { img =>
              MediaMeta(
                media_id = r.media_id,
                n_bytes = bytes.length,
                width = img.getWidth,
                height = img.getHeight,
                channels = img.getColorModel.getNumComponents,
                format = fmt)
            }
        }
        decoded.getOrElse {
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
