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

  /** ??? DECODE STUB ??? — non-image modalities (audio PCM, video codecs)
    * have no decoder in this JRE; stand-in: the raw bytes themselves.
    * Images go through the REAL `javax.imageio` path in [[decodeImages]]. */
  private def decodeStub(content: Array[Byte]): Array[Byte] = content

  /** Deterministic RGB PNG for a payload: dimensions derived from the
    * payload length, pixels tiled from the payload bytes — REAL codec
    * bytes, so the decode path exercises an actual image decoder. */
  private[operators] def encodePng(seed: Array[Byte]): Array[Byte] = {
    val w = (seed.length % 31) + 2
    val h = (seed.length / 31 % 29) + 2
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (seed.isEmpty) 0 else seed((y * w + x) % seed.length) & 0xff
        img.setRGB(x, y, (v << 16) | (((v * 31) & 0xff) << 8) | ((v * 131) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pack a text table as REAL PNG media rows (the payload drives the
    * deterministic image content; `orig_len` keeps the source length). */
  def packAsPngMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_1"),
        encode(col(payloadCol), "UTF-8").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        MediaRow(id, "image", encodePng(raw), raw.length.toLong, "image/png")
      })
  }

  final case class MediaPixels(media_id: Long, width: Int, height: Int,
                               channels: Int, pixel_count: Long,
                               pixel_checksum: Long)

  /** REAL image decode via `javax.imageio` (replaces the stub for
    * image formats the JRE decodes; other modalities are filtered).
    * Per-partition batch shape, like every codec stage here. Emits the
    * decoded geometry + an FNV checksum over the raster samples, so
    * oracles can assert the dimensions×channels=pixels invariant and
    * tests can assert lossless round-trips. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[MediaPixels] = {
    import media.sparkSession.implicits._
    media.filter(_.format.startsWith("image/")).mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      require(img != null, s"undecodable image payload for media ${r.media_id}")
      val raster = img.getRaster
      val (w, hgt, channels) = (img.getWidth, img.getHeight, raster.getNumBands)
      var h = 0xcbf29ce484222325L
      var y = 0
      while (y < hgt) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < channels) {
            h ^= (raster.getSample(x, y, c) & 0xffL); h *= 0x100000001b3L; c += 1
          }
          x += 1
        }
        y += 1
      }
      MediaPixels(r.media_id, w, hgt, channels, w.toLong * hgt * channels, h)
    })
  }

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
    require(nFrames > 0, s"nFrames must be positive, got $nFrames " +
      "(0 divides by zero inside executor tasks; negatives silently emit nothing)")
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
