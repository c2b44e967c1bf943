package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * IMAGE decode is REAL: [[imageMeta]] runs the JDK's `javax.imageio`
  * readers (PNG/JPEG/GIF/BMP ship with the JRE — no external dependency)
  * header-only inside `mapPartitions`. AUDIO decode is REAL too:
  * [[audioMeta]] parses RIFF/WAVE headers via `javax.sound.sampled`
  * (JRE-built-in). Only VIDEO codecs stay STUBBED behind
  * [[DecodeStub.decode]] — the container has no media libraries — with
  * the Spark-side plumbing (schema, partitioning, batch iteration,
  * deterministic outputs) real and tested. At scale every decode runs
  * inside `mapPartitions` so codec state is initialized once per
  * partition, not per row — the Scala equivalent of a Pandas `mapInPandas`
  * batch UDF.
  */
object Multimodal {

  final case class ImageAsset(doc_id: Long, bytes: Array[Byte])
  final case class ImageMeta(doc_id: Long, format: String, width: Int,
                             height: Int, channels: Int)

  /** Deterministic REAL PNG assets: per doc_id, render a
    * (16 + id%48)×(16 + id%32) image — gray / RGB / ARGB by id%3 — with
    * id-seeded pixels and ImageIO-encode it per partition. Exists so the
    * decode path below can be oracle-gated: the decoded header values are
    * analytic functions of doc_id that DuckDB computes without a codec. */
  def pngAssets(docs: DataFrame): Dataset[ImageAsset] = {
    import java.awt.image.BufferedImage
    implicit val enc: org.apache.spark.sql.Encoder[ImageAsset] =
      Encoders.product[ImageAsset]
    docs.select(col("doc_id").cast("long")).as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val w = (16 + id % 48).toInt
          val h = (16 + id % 32).toInt
          val t = (id % 3) match {
            case 0 => BufferedImage.TYPE_BYTE_GRAY
            case 1 => BufferedImage.TYPE_3BYTE_BGR
            case _ => BufferedImage.TYPE_4BYTE_ABGR
          }
          val img = new BufferedImage(w, h, t)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id * 31 + x * 7 + y * 13) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImageAsset(id, bos.toByteArray)
        }
      }
  }

  /** REAL image metadata decode via the JDK ImageIO reader registry,
    * header-only: `reader.getWidth/getHeight/getImageTypes` parse the
    * format header without materializing pixel data — at 100 TB that is
    * tens of bytes of codec I/O per asset, not the decoded bitmap.
    * Unrecognized bytes degrade to ("unknown", -1, -1, -1) rather than
    * failing the partition. */
  def imageMeta(assets: Dataset[ImageAsset]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageMeta] =
      Encoders.product[ImageMeta]
    assets.mapPartitions { it =>
      // reader registry is JVM-wide; readers themselves are per-image
      it.map { a =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.bytes))
        try {
          val rs = javax.imageio.ImageIO.getImageReaders(iis)
          if (!rs.hasNext) ImageMeta(a.doc_id, "unknown", -1, -1, -1)
          else {
            val r = rs.next()
            r.setInput(iis)
            try ImageMeta(a.doc_id, r.getFormatName.toLowerCase,
              r.getWidth(0), r.getHeight(0),
              r.getImageTypes(0).next().getNumComponents)
            finally r.dispose()
          }
        } catch {
          case _: Exception => ImageMeta(a.doc_id, "unknown", -1, -1, -1)
        } finally iis.close()
      }
    }.toDF()
  }

  final case class AudioAsset(doc_id: Long, bytes: Array[Byte])
  final case class AudioMeta(doc_id: Long, encoding: String, sample_rate: Int,
                             channels: Int, bits: Int, n_frames: Long,
                             duration_us: Long)

  /** Deterministic REAL WAV assets: per doc_id, synthesize
    * `100 + id%400` frames of 16-bit signed little-endian PCM at a sample
    * rate of 8/16/44.1 kHz (by id%3), mono/stereo (by id%2), id-seeded
    * samples, encoded per partition by the JDK's `javax.sound.sampled`
    * WAVE writer (JRE-built-in — no external dependency). Exists so the
    * decode path below can be oracle-gated: every decoded header value is
    * an analytic function of doc_id that DuckDB computes without a codec. */
  def wavAssets(docs: DataFrame): Dataset[AudioAsset] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    implicit val enc: org.apache.spark.sql.Encoder[AudioAsset] =
      Encoders.product[AudioAsset]
    docs.select(col("doc_id").cast("long")).as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val rate = (id % 3) match {
            case 0 => 8000; case 1 => 16000; case _ => 44100
          }
          val channels = (1 + id % 2).toInt
          val frames = (100 + id % 400).toInt
          val pcm = new Array[Byte](frames * channels * 2)
          var i = 0
          while (i < pcm.length) {
            pcm(i) = ((id * 131 + i * 7) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(rate.toFloat, 16, channels,
            /*signed*/ true, /*bigEndian*/ false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          AudioAsset(id, bos.toByteArray)
        }
      }
  }

  /** REAL audio metadata decode via the JDK `javax.sound.sampled` reader
    * registry, header-only: `AudioSystem.getAudioFileFormat` parses the
    * RIFF/WAVE header without streaming sample data — the same
    * tens-of-bytes-per-asset I/O profile as [[imageMeta]]. Unrecognized
    * bytes degrade to ("unknown", -1, …) rather than failing the
    * partition. */
  def audioMeta(assets: Dataset[AudioAsset]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[AudioMeta] =
      Encoders.product[AudioMeta]
    assets.mapPartitions { it =>
      it.map { a =>
        try {
          val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(a.bytes))
          val f = ff.getFormat
          val frames = ff.getFrameLength.toLong
          val rate = math.round(f.getSampleRate).toInt
          AudioMeta(a.doc_id,
            f.getEncoding.toString.toLowerCase, rate, f.getChannels,
            f.getSampleSizeInBits, frames,
            // duration from header fields only; integer microseconds so
            // the oracle's integer arithmetic reproduces it exactly
            frames * 1000000L / rate)
        } catch {
          case _: Exception =>
            AudioMeta(a.doc_id, "unknown", -1, -1, -1, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** Deterministic fake assets derived from document text: the "media bytes"
    * are md5-derived, with per-doc varying length — enough structure to
    * exercise binary columns, slicing and frame iteration. */
  def fakeAssets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("unhex(repeat(md5(text), 1 + cast(doc_id % 3 as int)))").as("bytes"),
      struct(
        (lit(16) + col("doc_id") % 48).cast("int").as("width"),
        (lit(16) + col("doc_id") % 32).cast("int").as("height"),
        (col("doc_id") % 3).cast("int").as("channels")).as("meta"))

  final case class Asset(doc_id: Long, bytes: Array[Byte])
  final case class DecodedFeature(doc_id: Long, n_bytes: Int, checksum: Long,
                                  mean_byte: Double)

  object DecodeStub {
    /** Stub for a real VIDEO decoder (image and audio decode are real, see
      * [[imageMeta]]/[[audioMeta]]). A production build would replace the
      * body with e.g. ffmpeg-bindings; the deterministic fake keeps the
      * distributed pipeline testable. */
    def decode(bytes: Array[Byte]): DecodedFeature = {
      // real decoder would go here: ??? — deterministic fake below
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      DecodedFeature(-1L, bytes.length, sum,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
    }
  }

  /** Per-partition batched decode — codec init happens once per partition
    * (the `mapInPandas` batch shape). */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[DecodedFeature] = {
    implicit val enc = Encoders.product[DecodedFeature]
    assets.mapPartitions { it =>
      // per-partition "codec" initialization would happen here
      it.map(a => DecodeStub.decode(a.bytes).copy(doc_id = a.doc_id))
    }
  }

  /** Resize stub: deterministic nearest-neighbor-style downsample of the
    * media bytes to the byte budget implied by (targetW × targetH ×
    * meta.channels) — every k-th byte is kept, k = ceil(orig/target). A real
    * build swaps the byte arithmetic for an image scaler; the Spark shape
    * (binary in → smaller binary out + updated metadata, all built-ins, no
    * UDF) is the part that matters at 100 TB. */
  def resize(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val tgt = s"greatest(1, $targetW * $targetH * greatest(meta.channels, 1))"
    assets.select(col("doc_id"),
      expr(
        s"""case when length(bytes) <= $tgt then bytes else
           |  aggregate(
           |    filter(sequence(0, length(bytes) - 1),
           |           i -> i % cast(ceil(length(bytes) / $tgt) as int) = 0),
           |    cast('' as binary),
           |    (acc, i) -> concat(acc, substring(bytes, i + 1, 1)))
           |end""".stripMargin).as("bytes"),
      struct(lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.channels").as("channels"),
        length(col("bytes")).as("orig_bytes")).as("meta"))
  }

  /** Frame sampling: every `stride`-th `frameSize`-byte slice of the media
    * column — pure built-ins, stays in codegen. */
  def frameSample(assets: DataFrame, frameSize: Int, stride: Int): DataFrame =
    assets.select(col("doc_id"),
        explode(expr(
          s"""transform(
             |  filter(sequence(0, cast(length(bytes)/$frameSize as int) - 1),
             |         i -> i % $stride = 0),
             |  i -> struct(i as frame_no,
             |              substring(bytes, i * $frameSize + 1, $frameSize) as frame))""".stripMargin))
          .as("f"))
      .select(col("doc_id"), col("f.frame_no"), col("f.frame"))
}
