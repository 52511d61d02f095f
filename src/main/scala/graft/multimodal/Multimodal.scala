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

  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Image FEATURE EXTRACTION — the bridge from the opaque-binary column
    * to the ANN/dedup family: decode, downscale to a `grid`×`grid` mean-
    * luminance thumbnail, L2-normalize → an `Array[Float]` embedding the
    * vector operators (cosine KNN, SRP near-dup, SemDeDup) consume
    * directly. A grayscale thumbnail is the classic perceptual-hash
    * feature (aHash's real-valued parent): near-identical images — crops
    * aside — land at cosine ≈ 1, unrelated images decorrelate. Real
    * `javax.imageio` decode for PNG/JPEG/GIF/BMP; non-image payloads get
    * the deterministic stub vector so a mixed corpus keeps flowing
    * (filter on `decodeMeta().format` upstream to exclude them).
    *
    * Narrow map, per-partition decoder init, only (id, g² floats) flows
    * onward — at 100 TB of images this is the step that turns a binary
    * lake into a 64-float-per-row table every downstream dedup runs on.
    */
  def imageEmbedding(
      spark: SparkSession,
      media: DataFrame,
      grid: Int = 8): Dataset[MediaEmbedding] = {
    import spark.implicits._
    require(grid > 0, s"grid must be positive: $grid")
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        // Try, not just Option: a TRUNCATED image passes the magic-byte
        // sniff and then throws IIOException mid-decode — at crawl scale
        // one damaged file must fall to the stub, never kill the job.
        val img = sniffImageFormat(r.payload).flatMap(_ =>
          scala.util.Try(Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))).toOption.flatten)
        val vec = img match {
          case Some(im) =>
            val (w, h) = (im.getWidth, im.getHeight)
            val sums = new Array[Double](grid * grid)
            val counts = new Array[Long](grid * grid)
            var y = 0
            while (y < h) {
              val gy = math.min(y * grid / h, grid - 1)
              var x = 0
              while (x < w) {
                val gx = math.min(x * grid / w, grid - 1)
                val rgb = im.getRGB(x, y)
                // ITU-R BT.601 luma weights.
                val lum = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                sums(gy * grid + gx) += lum
                counts(gy * grid + gx) += 1
                x += 1
              }
              y += 1
            }
            sums.indices.map(i =>
              if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat).toArray
          case None => stubVec(r.payload, grid * grid)
        }
        val norm = math.sqrt(vec.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
        // A zero-luminance (all-black) image has no structure to embed and
        // a zero vector would poison every downstream cosine with NaN —
        // take the payload-derived stub like any other undecodable input,
        // keeping the L2-normalized contract total.
        val unit =
          if (norm == 0f) {
            val s = stubVec(r.payload, grid * grid)
            val sn = math.sqrt(s.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
            s.map(_ / sn)
          } else vec.map(_ / norm)
        MediaEmbedding(r.media_id, unit)
      }
    }
  }

  /** Deterministic payload-hash-seeded vector — the fallback that keeps a
    * mixed/damaged corpus flowing end to end. Strictly positive entries,
    * so its norm is never zero. */
  private def stubVec(payload: Array[Byte], dim: Int): Array[Float] = {
    val h0 = payload.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    Array.tabulate(dim)(i =>
      (((h0 * (i + 1) + 7919L * i) % 1000L).toFloat + 1f) / 1001f)
  }

  final case class AudioMeta(
      media_id: Long,
      sample_rate: Int,
      n_frames: Long,
      channels: Int,
      format: String,
      envelope: Array[Float])

  /** Audio decode + amplitude-envelope extraction. WAV/PCM decode is REAL:
    * `javax.sound.sampled` ships with the JDK, so RIFF/WAVE payloads go
    * through `AudioSystem` (no external codec needed) — sample rate, frame
    * count, and channel layout from the actual header, and the envelope is
    * the per-bin mean |amplitude| of the decoded 16-bit PCM, normalized to
    * [0, 1]. The envelope is the cheapest useful audio feature: silence
    * detection, clipping detection, and coarse content fingerprinting for
    * the dedup family all read it. Non-audio payloads take the
    * deterministic stub (compressed codecs — MP3/AAC/Opus — do not exist
    * in this environment; at production scale this map body swaps in a
    * real decoder, the Spark plumbing is unchanged). Narrow map, same
    * batch shape as [[decodeMeta]].
    */
  def audioEnvelope(
      spark: SparkSession,
      media: DataFrame,
      bins: Int = 16): Dataset[AudioMeta] = {
    import spark.implicits._
    require(bins > 0, s"bins must be positive: $bins")
    def isRiffWave(b: Array[Byte]): Boolean =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          if (!isRiffWave(r.payload)) None
          else scala.util.Try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val fmt = in.getFormat
              val bytesPerSample = fmt.getSampleSizeInBits / 8
              // NOT_SPECIFIED (-1) frame size, or a sample width outside
              // 8/16/24/32-bit PCM, must refuse into the stub — an
              // all-zero envelope labeled "wav" would classify a loud
              // file as silence downstream.
              require(bytesPerSample >= 1 && bytesPerSample <= 4,
                s"unsupported PCM sample width: ${fmt.getSampleSizeInBits} bits")
              val frameSize =
                if (fmt.getFrameSize > 0) fmt.getFrameSize
                else bytesPerSample * math.max(fmt.getChannels, 1)
              val nFrames = in.getFrameLength
              val all = in.readAllBytes()
              val ch = fmt.getChannels
              val sums = new Array[Double](bins)
              val counts = new Array[Long](bins)
              val totalFrames = math.max(all.length / frameSize, 1)
              val fullScale = math.pow(2, bytesPerSample * 8 - 1)
              var f = 0
              while (f < all.length / frameSize) {
                // First channel's sample: signed little-endian PCM of any
                // 1/2/3/4-byte width (8-bit WAV is unsigned by spec).
                val off = f * frameSize
                val amp =
                  if (bytesPerSample == 1) {
                    math.abs(((all(off) & 0xff) - 128).toDouble / 128.0)
                  } else {
                    var v = 0L
                    var b = 0
                    while (b < bytesPerSample) {
                      v |= (all(off + b) & 0xffL) << (8 * b)
                      b += 1
                    }
                    // Sign-extend from the sample width.
                    val shift = 64 - bytesPerSample * 8
                    math.abs(((v << shift) >> shift).toDouble / fullScale)
                  }
                val bin = math.min(f * bins / totalFrames, bins - 1)
                sums(bin) += amp
                counts(bin) += 1
                f += 1
              }
              AudioMeta(r.media_id, fmt.getSampleRate.toInt, nFrames, ch, "wav",
                sums.indices.map(i =>
                  if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat).toArray)
            } finally in.close()
          }.toOption
        decoded.getOrElse {
          val h0 = r.payload.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
          AudioMeta(r.media_id, 16000, r.payload.length.toLong, 1, "stub",
            Array.tabulate(bins)(i => ((h0 * (i + 1)) % 1000L).toFloat / 1000f))
        }
      }
    }
  }
}
