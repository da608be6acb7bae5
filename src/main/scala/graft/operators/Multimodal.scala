package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media ride as opaque `binary` columns with
  * typed metadata; decode / feature-extraction / frame-sampling run as
  * `mapPartitions` over the binary payloads (the Scala analog of
  * `mapInPandas` batch UDFs — one partition = one batch, no per-row
  * serialization overhead, embarrassingly parallel, no shuffle).
  *
  * The actual image/audio codecs are NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic stand-in; everything
  * around it — schema, batch shape, partitioning, feature plumbing — is
  * real and tested.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String,
                            content: Array[Byte], orig_len: Long, format: String)
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_len: Long, histogram: Array[Double],
                                 checksum: Long)
  final case class FrameSample(media_id: Long, frame_idx: Int,
                               frame_len: Long, frame_checksum: Long)

  /** Pack a text table into binary media rows (deterministic fake payloads:
    * UTF-8 bytes stand in for encoded media). */
  def packAsMedia(df: DataFrame, idCol: String, payloadCol: String,
                  modality: String = "image", format: String = "fake/raw"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        encode(col(payloadCol), "UTF-8").as("content"))
      .withColumn("modality", lit(modality))
      .withColumn("orig_len", length(col("content")).cast("long"))
      .withColumn("format", lit(format))
      .as[MediaRow]
  }

  /** ??? DECODE STUB ??? — a real pipeline would decode the codec here
    * (JPEG→pixels, PCM→samples). Stand-in: the raw bytes themselves. */
  private def decodeStub(content: Array[Byte]): Array[Byte] = content

  /** Per-partition batch feature extraction: 16-bin byte histogram
    * (normalized) + FNV checksum — the deterministic stand-in for an
    * embedding/feature model over decoded media. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = decodeStub(r.content)
        val hist = new Array[Double](16)
        decoded.foreach(b => hist((b & 0xff) >> 4) += 1.0)
        val n = math.max(decoded.length, 1)
        var h = 0xcbf29ce484222325L
        decoded.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
        MediaFeatures(r.media_id, r.modality, decoded.length.toLong,
          hist.map(_ / n), h)
      }
    }
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * `nFrames` equal chunks, emit per-frame checksums (stand-in for frame
    * decode + thumbnail). One row in, nFrames rows out — flatMap shape. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val chunk = math.max(r.content.length / nFrames, 1)
      (0 until nFrames).iterator.takeWhile(i => i * chunk < r.content.length).map { i =>
        val frame = r.content.slice(i * chunk,
          if (i == nFrames - 1) r.content.length else (i + 1) * chunk)
        var h = 0xcbf29ce484222325L
        frame.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
        FrameSample(r.media_id, i, frame.length.toLong, h)
      }
    }
  }
}
