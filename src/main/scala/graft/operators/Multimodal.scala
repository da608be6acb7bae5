package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media ride as opaque `binary` columns with
  * typed metadata; decode / feature-extraction / frame-sampling run as
  * `mapPartitions` over the binary payloads (the Scala analog of
  * `mapInPandas` batch UDFs — one partition = one batch, no per-row
  * serialization overhead, embarrassingly parallel, no shuffle).
  *
  * Decoders: images through the REAL `javax.imageio` path
  * ([[decodeImages]]), audio through the REAL `javax.sound.sampled`
  * WAV/PCM path ([[decodeAudio]]) — both in-JDK codecs, no external
  * deps. Video has no in-JDK codec: its payloads get BYTE-LEVEL
  * treatment only ([[extractFeatures]] histograms/checksums,
  * [[sampleFrames]] chunking) — real plumbing, no frame decode, by
  * design in this environment.
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
    * UTF-8 bytes stand in for encoded media). NULL payloads are dropped
    * here, at the boundary — a `content = null` MediaRow would NPE
    * inside executor tasks at the first downstream byte walk
    * (extractFeatures/decode/encode), failing the whole job with no
    * indication of the row at fault. */
  def packAsMedia(df: DataFrame, idCol: String, payloadCol: String,
                  modality: String = "image", format: String = "fake/raw"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(payloadCol).isNotNull)
      .select(col(idCol).cast("long").as("media_id"),
        encode(col(payloadCol), "UTF-8").as("content"))
      .withColumn("modality", lit(modality))
      .withColumn("orig_len", length(col("content")).cast("long"))
      .withColumn("format", lit(format))
      .as[MediaRow]
  }

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

  /** Per-partition batch feature extraction over the ENCODED byte
    * stream: 16-bin byte histogram (normalized) + FNV checksum — the
    * deterministic stand-in for an embedding/feature model. Operates on
    * payload bytes by design (container-level features); use
    * [[decodeImages]]/[[decodeAudio]] for decoded-domain invariants. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        val hist = new Array[Double](16)
        bytes.foreach(b => hist((b & 0xff) >> 4) += 1.0)
        val n = math.max(bytes.length, 1)
        var h = 0xcbf29ce484222325L
        bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
        MediaFeatures(r.media_id, r.modality, bytes.length.toLong,
          hist.map(_ / n), h)
      }
    }
  }

  final case class AudioSamples(media_id: Long, channels: Int,
                                sample_rate: Int, frames: Long,
                                sample_count: Long, sample_checksum: Long)

  /** Deterministic 16-bit PCM WAV for a payload — REAL codec bytes
    * (RIFF/WAVE container written by `javax.sound.sampled`): channel
    * count and frame count derive from the payload length, samples from
    * the payload bytes, so decode invariants are predictable from the
    * source row. */
  private[operators] def encodeWav(seed: Array[Byte]): Array[Byte] = {
    val channels = (seed.length % 2) + 1
    val frames = (seed.length % 977) + 64
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val base = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      val s = ((base << 8) ^ (i * 0x9E3779B9).toInt) & 0xffff
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, channels,
      true, false) // signed PCM, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Pack a text table as REAL WAV media rows (the payload drives the
    * deterministic PCM content; `orig_len` keeps the source length). */
  def packAsWavMedia(df: DataFrame, idCol: String,
                     payloadCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_1"),
        encode(col(payloadCol), "UTF-8").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        MediaRow(id, "audio", encodeWav(raw), raw.length.toLong, "audio/wav")
      })
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/PCM — in-JDK, no
    * external codec deps). Per-partition batch shape. Emits the decoded
    * geometry (channels, rate, frames) + an FNV checksum over the
    * signed 16-bit samples, so oracles can assert the
    * frames×channels=samples invariant and tests can assert lossless
    * PCM round-trips. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioSamples] = {
    import media.sparkSession.implicits._
    media.filter(_.format.startsWith("audio/")).mapPartitions(_.map { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"media ${r.media_id}: expected 16-bit little-endian PCM, got $fmt")
      val channels = fmt.getChannels
      val bytes = ais.readAllBytes()
      val nSamples = bytes.length / 2
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < nSamples) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)) & 0xffff
        h ^= s.toLong; h *= 0x100000001b3L
        i += 1
      }
      AudioSamples(r.media_id, channels, fmt.getSampleRate.toInt,
        nSamples.toLong / channels, nSamples.toLong, h)
    })
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * `nFrames` equal chunks, emit per-frame checksums (stand-in for frame
    * decode + thumbnail). One row in, UP TO nFrames rows out (flatMap
    * shape): a payload shorter than nFrames bytes cannot yield nFrames
    * distinct chunks and emits one frame per byte; empty payloads emit
    * zero frames. Consumers must key on (media_id, frame_idx), never
    * assume a fixed per-media row count. */
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
