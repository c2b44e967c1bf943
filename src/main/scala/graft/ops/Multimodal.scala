package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — the container has no
  * media libraries — behind [[DecodeStub.decode]]; everything Spark-side
  * (schema, partitioning, batch iteration, deterministic outputs) is real
  * and tested. At scale the decode runs inside `mapPartitions` so codec
  * state is initialized once per partition, not per row — the Scala
  * equivalent of a Pandas `mapInPandas` batch UDF.
  */
object Multimodal {

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
    /** Stub for a real image/audio decoder. A production build would replace
      * the body with e.g. TwelveMonkeys/ImageIO or ffmpeg-bindings; the
      * deterministic fake keeps the distributed pipeline testable. */
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
