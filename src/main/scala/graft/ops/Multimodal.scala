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
  * (JRE-built-in), and VIDEO-CONTAINER metadata is REAL as well:
  * [[mp4Meta]] hand-walks the public ISO-BMFF box layout. Only the video
  * CODEC layer (frame/sample decode) stays STUBBED behind
  * [[DecodeStub.decode]] — the container image has no media libraries —
  * with the Spark-side plumbing (schema, partitioning, batch iteration,
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

  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             dhash: Long)

  /** Perceptual difference-hash (dHash) over REAL decoded pixels — the
    * image near-dup fingerprint of a multimodal curation pipeline: decode
    * the full bitmap (ImageIO), integer-luma each sampled pixel
    * ((299r+587g+114b)/1000), nearest-neighbor-sample a 9×8 grid, and set
    * bit gy·8+gx iff luma(gx+1,gy) > luma(gx,gy) — 64 bits per image,
    * equal/near-equal hashes = visual near-dups. All arithmetic is integer
    * and the sample coordinates are floor(g·dim/grid), so on the lossless
    * RGB PNGs of [[pngAssets]] the hash is an analytic function of doc_id
    * the oracle computes without a codec (the [[imageMeta]] gate pattern,
    * extended from header fields to the pixel path).
    *
    * Scale shape: per-partition codec batches, one narrow map — the hash is
    * 8 bytes/image; downstream dedup joins on it like any signature. */
  def imageDHash(assets: Dataset[ImageAsset]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageHash] =
      Encoders.product[ImageHash]
    assets.mapPartitions { it =>
      it.map { a =>
        // undecodable bytes degrade to a (-1, -1, 0) sentinel row (the
        // audioFeatures convention) — ImageIO.read returns null on an
        // unrecognized container and throws on truncated payloads, and
        // either would otherwise kill the whole task
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.bytes))
          if (img == null) ImageHash(a.doc_id, -1, -1, 0L)
          else {
            val w = img.getWidth; val h = img.getHeight
            def luma(gx: Int, gy: Int): Int = {
              val v = img.getRGB(gx * w / 9, gy * h / 8)
              val r = (v >> 16) & 255; val g = (v >> 8) & 255; val b = v & 255
              (299 * r + 587 * g + 114 * b) / 1000
            }
            var hash = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (luma(gx + 1, gy) > luma(gx, gy))
                  hash |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            ImageHash(a.doc_id, w, h, hash)
          }
        } catch {
          case _: Exception => ImageHash(a.doc_id, -1, -1, 0L)
        }
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

  final case class AudioFeatures(doc_id: Long, n_samples: Long, sum_sq: Long,
                                 peak: Int, zero_crossings: Long, rms: Double)

  /** REAL audio sample-data decode + feature extraction — the
    * feature-extract stage of a multimodal pipeline, one level deeper than
    * [[audioMeta]]'s header fields: `AudioSystem.getAudioInputStream`
    * streams the PCM payload, and the features are integer-exact
    * aggregates of the decoded 16-bit samples (Σs² and peak over all
    * channels, sign crossings over channel 0), so on [[wavAssets]]'
    * id-seeded PCM the oracle replays them analytically — the gate proves
    * the WAVE round-trip to the sample level. RMS is the single
    * double-sqrt at the end.
    *
    * Scale shape: per-partition codec batches, one narrow map, 5 numbers
    * per asset out. */
  def audioFeatures(assets: Dataset[AudioAsset]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[AudioFeatures] =
      Encoders.product[AudioFeatures]
    assets.mapPartitions { it =>
      it.map { a =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.bytes))
          val fmt = ais.getFormat
          val ch = fmt.getChannels
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var sumSq = 0L; var peak = 0; var crossings = 0L
          var prevNeg = false; var first = true
          var k = 0
          while (k < n) {
            // little-endian signed 16-bit
            val s = ((pcm(2 * k) & 0xff) | (pcm(2 * k + 1) << 8)).toShort.toInt
            sumSq += s.toLong * s
            val as = math.abs(s)
            if (as > peak) peak = as
            if (k % ch == 0) {            // channel-0 frame stream
              val neg = s < 0
              if (!first && neg != prevNeg) crossings += 1
              prevNeg = neg; first = false
            }
            k += 1
          }
          AudioFeatures(a.doc_id, n.toLong, sumSq, peak, crossings,
            math.sqrt(sumSq.toDouble / n))
        } catch {
          case _: Exception => AudioFeatures(a.doc_id, -1L, -1L, -1, -1L, -1.0)
        }
      }
    }.toDF()
  }

  final case class VideoAsset(doc_id: Long, bytes: Array[Byte])
  final case class VideoMeta(doc_id: Long, brand: String, timescale: Int,
                             duration: Long, duration_us: Long,
                             width: Int, height: Int, n_tracks: Int)

  private def bmffBox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    b.put(payload)
    b.array()
  }

  private def unityMatrix(b: java.nio.ByteBuffer): Unit = {
    b.putInt(0x10000); b.putInt(0); b.putInt(0)
    b.putInt(0); b.putInt(0x10000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
  }

  /** Deterministic REAL MP4 containers: per doc_id, an ISO-BMFF file
    * (`ftyp` + `moov`(`mvhd` + one `trak`(`tkhd`) per track)) built
    * byte-exactly to the public ISO/IEC 14496-12 box layout — movie
    * timescale 600/1000/90000 Hz (by id%3), duration `1000 + id%9000`
    * units, first-track display size (320+16·(id%8))×(240+16·(id%5)),
    * `1 + id%2` tracks. No codec or sample data — the metadata layer IS
    * the container format, which is exactly what a catalog scan reads. */
  def mp4Assets(docs: DataFrame): Dataset[VideoAsset] = {
    implicit val enc: org.apache.spark.sql.Encoder[VideoAsset] =
      Encoders.product[VideoAsset]
    docs.select(col("doc_id").cast("long")).as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val timescale = (id % 3) match {
            case 0 => 600; case 1 => 1000; case _ => 90000
          }
          val duration = (1000 + id % 9000).toInt
          val w = (320 + 16 * (id % 8)).toInt
          val h = (240 + 16 * (id % 5)).toInt
          val nTracks = (1 + id % 2).toInt
          val ftyp = bmffBox("ftyp", {
            val p = java.nio.ByteBuffer.allocate(8)
            p.put("isom".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
            p.putInt(0x200)
            p.array()
          })
          val mvhd = bmffBox("mvhd", {
            val p = java.nio.ByteBuffer.allocate(100)
            p.putInt(0)              // version 0 + flags
            p.putInt(0); p.putInt(0) // creation/modification time
            p.putInt(timescale); p.putInt(duration)
            p.putInt(0x00010000)     // rate 1.0
            p.putShort(0x0100.toShort) // volume 1.0
            p.putShort(0); p.putInt(0); p.putInt(0) // reserved
            unityMatrix(p)
            (0 until 6).foreach(_ => p.putInt(0)) // pre_defined
            p.putInt(nTracks + 1)    // next_track_ID
            p.array()
          })
          // sample timing for the first track: a REAL stts (decoding-time-
          // to-sample) box with two runs of deterministic deltas — the
          // container structure a frame sampler walks
          val n1 = (8 + id % 8).toInt;  val d1 = (100 + id % 100).toInt
          val n2 = (4 + id % 4).toInt;  val d2 = (200 + id % 50).toInt
          val mdia = bmffBox("mdia",
            bmffBox("mdhd", {
              val p = java.nio.ByteBuffer.allocate(24)
              p.putInt(0)              // version 0 + flags
              p.putInt(0); p.putInt(0) // creation/modification time
              p.putInt(timescale)      // media timescale (= movie here)
              p.putInt(n1 * d1 + n2 * d2) // media duration in its timescale
              p.putShort(0x55c4.toShort)  // language: und
              p.putShort(0)
              p.array()
            }) ++ bmffBox("minf", bmffBox("stbl", bmffBox("stts", {
              val p = java.nio.ByteBuffer.allocate(8 + 2 * 8)
              p.putInt(0)              // version 0 + flags
              p.putInt(2)              // entry_count
              p.putInt(n1); p.putInt(d1)
              p.putInt(n2); p.putInt(d2)
              p.array()
            }))))
          val traks = (1 to nTracks).map { t =>
            val tkhd = bmffBox("tkhd", {
              val p = java.nio.ByteBuffer.allocate(84)
              p.putInt(7)              // version 0 + flags: enabled|in-movie|in-preview
              p.putInt(0); p.putInt(0) // creation/modification time
              p.putInt(t)              // track_ID
              p.putInt(0)              // reserved
              p.putInt(duration)
              p.putInt(0); p.putInt(0) // reserved
              p.putShort(0); p.putShort(0) // layer, alternate_group
              p.putShort(0); p.putShort(0) // volume, reserved
              unityMatrix(p)
              p.putInt(w << 16); p.putInt(h << 16) // 16.16 fixed point
              p.array()
            })
            bmffBox("trak", if (t == 1) tkhd ++ mdia else tkhd)
          }
          val moov = bmffBox("moov", (mvhd +: traks).reduce(_ ++ _))
          VideoAsset(id, ftyp ++ moov)
        }
      }
  }

  /** REAL video-container metadata decode: a hand-rolled ISO-BMFF box walk
    * (public ISO/IEC 14496-12 layout — no codec library involved) over the
    * binary column. Reads `ftyp`'s major brand, `mvhd`'s movie timescale +
    * duration, the FIRST `tkhd`'s 16.16 display size, and counts `trak`
    * boxes; header-only I/O like [[imageMeta]]/[[audioMeta]]. Frame/sample
    * decode (the codec layer) stays behind [[DecodeStub]]. Malformed bytes
    * degrade to ("unknown", -1, …). */
  def mp4Meta(assets: Dataset[VideoAsset]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[VideoMeta] =
      Encoders.product[VideoMeta]
    assets.mapPartitions { it =>
      it.map { a =>
        try {
          val buf = java.nio.ByteBuffer.wrap(a.bytes)
          var brand = "unknown"
          var timescale = -1; var duration = -1L
          var width = -1; var height = -1; var nTracks = 0
          def typStr(i: Int): String =
            new String(a.bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
          def walk(from: Int, end: Int, depth: Int): Unit = {
            var off = from
            while (off + 8 <= end) {
              val size = buf.getInt(off)
              if (size < 8 || off + size > end) return
              typStr(off + 4) match {
                case "ftyp" if size >= 12 => brand = typStr(off + 8)
                case "moov" | "trak" => // container boxes: descend
                  if (typStr(off + 4) == "trak") nTracks += 1
                  walk(off + 8, off + size, depth + 1)
                case "mvhd" if size >= 28 =>
                  timescale = buf.getInt(off + 20)
                  duration = buf.getInt(off + 24).toLong
                case "tkhd" if size >= 92 && width < 0 =>
                  width = buf.getInt(off + 84) >>> 16
                  height = buf.getInt(off + 88) >>> 16
                case _ => ()
              }
              off += size
            }
          }
          walk(0, a.bytes.length, 0)
          if (timescale <= 0) VideoMeta(a.doc_id, "unknown", -1, -1L, -1L, -1, -1, 0)
          else VideoMeta(a.doc_id, brand, timescale, duration,
            duration * 1000000L / timescale, width, height, nTracks)
        } catch {
          case _: Exception =>
            VideoMeta(a.doc_id, "unknown", -1, -1L, -1L, -1, -1, 0)
        }
      }
    }.toDF()
  }

  final case class FrameSample(doc_id: Long, sample_no: Long, ts_units: Long,
                               ts_us: Long)

  /** REAL container-level frame sampling: walks the ISO-BMFF tree down to
    * `moov/trak/mdia/minf/stbl/stts` (the decoding-time-to-sample table,
    * ISO/IEC 14496-12 §8.6.1.2) plus `mdhd` for the media timescale,
    * expands the run-length (count, delta) entries to per-sample decode
    * timestamps, and keeps every `stride`-th sample — exactly what a
    * video-curation pipeline does to pick frames for captioning/embedding
    * WITHOUT touching the codec layer. Per-row work is bounded by the
    * sample count of one file; the operator is embarrassingly parallel
    * (mapPartitions, no shuffle). Malformed/track-less files yield no
    * rows rather than failing the job. */
  def mp4FrameSamples(assets: Dataset[VideoAsset], stride: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[FrameSample] =
      Encoders.product[FrameSample]
    assets.flatMap { a =>
      try {
        val buf = java.nio.ByteBuffer.wrap(a.bytes)
        var timescale = -1
        var entries: List[(Int, Int)] = Nil
        def typStr(i: Int): String =
          new String(a.bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        def walk(from: Int, end: Int): Unit = {
          var off = from
          while (off + 8 <= end) {
            val size = buf.getInt(off)
            if (size < 8 || off + size > end) return
            typStr(off + 4) match {
              case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
                walk(off + 8, off + size)
              case "mdhd" if size >= 24 && timescale < 0 =>
                timescale = buf.getInt(off + 20)
              case "stts" if size >= 16 && entries.isEmpty =>
                val n = buf.getInt(off + 12)
                entries = (0 until math.min(n, (size - 16) / 8)).toList.map { e =>
                  (buf.getInt(off + 16 + e * 8), buf.getInt(off + 20 + e * 8))
                }
              case _ => ()
            }
            off += size
          }
        }
        walk(0, a.bytes.length)
        if (timescale <= 0 || entries.isEmpty) Iterator.empty
        else {
          var sampleNo = 0L
          var ts = 0L
          val out = scala.collection.mutable.ArrayBuffer.empty[FrameSample]
          entries.foreach { case (count, delta) =>
            var j = 0
            while (j < count) {
              if (sampleNo % stride == 0)
                out += FrameSample(a.doc_id, sampleNo, ts,
                  ts * 1000000L / timescale)
              ts += delta; sampleNo += 1; j += 1
            }
          }
          out.iterator
        }
      } catch { case _: Exception => Iterator.empty }
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
    /** Stub for a real VIDEO FRAME decoder (image, audio, and video
      * CONTAINER metadata decode are real — [[imageMeta]]/[[audioMeta]]/
      * [[mp4Meta]]; only the codec layer is missing). A production build
      * would replace the body with e.g. ffmpeg-bindings; the deterministic
      * fake keeps the distributed pipeline testable. */
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
