package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from a media blob. */
case class MediaMeta(kind: String, width: Int, height: Int,
                     sampleRate: Int, nFrames: Int, ok: Boolean)

/** A media row as carried through the pipeline: the blob is an opaque
  * binary column + typed metadata, the schema pattern for multimodal
  * training-data tables at scale (blob stays columnar-compressed in
  * parquet; metadata is filterable without touching bytes). */
case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
case class DecodedRow(media_id: Long, kind: String, n_bytes: Int,
                      meta: MediaMeta, features: Array[Float])

/** Pluggable decoder boundary. Implementations must be Serializable
  * (shipped to executors) and are invoked batched per partition. */
trait MediaDecoder extends Serializable {
  def decode(kind: String, bytes: Array[Byte]): MediaMeta
  def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
}

/** The codec-BOUND decoder would bind an image/audio codec
  * (JavaCPP/FFmpeg, ImageIO, ...). Those libraries are not in this
  * container, so the binding is left unimplemented by design. The
  * codec-FREE formats are decoded for real by [[PortableDecoder]]
  * (netpbm P6, concatenated-P6 streams, PCM WAV — pure JVM parsing,
  * q102-oracled); the Spark-side plumbing (schema, partitioning, batch
  * shape) is additionally exercised with [[FakeDecoder]]. */
object NativeDecoder extends MediaDecoder {
  def decode(kind: String, bytes: Array[Byte]): MediaMeta = ???
  def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = ???
}

/** Deterministic stand-in decoder: metadata and features are pure
  * functions of the bytes (splitmix-style mixing), so tests are exact
  * and repeatable. */
object FakeDecoder extends MediaDecoder {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def contentHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }
  def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
    val h = mix(contentHash(bytes))
    kind match {
      case "image" => MediaMeta(kind, 64 + (Math.floorMod(h, 960)).toInt,
        64 + Math.floorMod(h >>> 10, 960).toInt, 0, 1, ok = true)
      case "audio" => MediaMeta(kind, 0, 0,
        8000 + Math.floorMod(h, 40000).toInt * 1, 0, ok = true)
      case _ => MediaMeta(kind, 0, 0, 0,
        1 + Math.floorMod(h, 3000).toInt, ok = true)
    }
  }
  def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val base = mix(contentHash(bytes))
    Array.tabulate(dim)(i => (mix(base + i) % 1000) / 1000.0f)
  }
}

/** Multimodal-column operators: decode / feature-extract over opaque
  * binary columns.
  *
  * Executed with `mapPartitions` so a real decoder amortizes
  * per-partition init (codec contexts, model weights) across the rows
  * of each partition — the Scala analog of arrow-batched `mapInPandas`.
  * Narrow transformation: no shuffle, scales linearly with input
  * splits.
  */
object Multimodal {

  /** Test-data synthesis: documents → media rows with the text bytes as
    * blob and a deterministic kind per id. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"))

  /** REAL container synthesis for [[PortableDecoder]]: well-formed P6 /
    * concatenated-P6 / PCM-WAV blobs whose header fields are pure
    * functions of the id — so an independent engine can verify that
    * decode inverts synthesis arithmetically, without parsing a byte
    * (the q102 oracle). */
  def synthesizePortable(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    val ids = docs.select(col("doc_id").cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions { it =>
      it.map(id => MediaRow(id, PortableMedia.kindOf(id), PortableMedia.blob(id)))
    }.toDF()
  }

  /** BMP-still synthesis for the q103 oracle: every document becomes a
    * real uncompressed 24-bit BMP whose dimensions are pure functions
    * of the id (see [[PortableMedia.bmpBlob]]), so the oracle re-derives
    * width/height/byte-count arithmetically and a pass proves the BMP
    * parser inverts the synthesis. */
  def synthesizeBmp(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    val ids = docs.select(col("doc_id").cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions { it =>
      it.map(id => MediaRow(id, "image", PortableMedia.bmpBlob(id)))
    }.toDF()
  }

  /** Batched decode: blob → typed metadata + feature vector. */
  def decodeAll(media: DataFrame, decoder: MediaDecoder,
                featureDim: Int = 8): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    implicit val inEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init happens here (decoder contexts etc.)
      it.map { r =>
        DecodedRow(r.media_id, r.kind, r.bytes.length,
          decoder.decode(r.kind, r.bytes),
          decoder.features(r.kind, r.bytes, featureDim))
      }
    }
  }

  /** Image resize: decode → scale metadata to fit (maxW, maxH)
    * preserving aspect; the re-encoded blob is produced by the decoder
    * boundary (fake: truncated bytes; native: a real scaler). Returns
    * (media_id, width, height, bytes). */
  def resize(media: DataFrame, decoder: MediaDecoder,
             maxW: Int, maxH: Int): Dataset[ResizedRow] = {
    implicit val enc = Encoders.product[ResizedRow]
    implicit val inEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val m = decoder.decode(r.kind, r.bytes)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / math.max(m.width, 1),
            maxH.toDouble / math.max(m.height, 1)))
        val w = math.max(1, (m.width * scale).toInt)
        val h = math.max(1, (m.height * scale).toInt)
        val outLen = math.max(1, (r.bytes.length * scale * scale).toInt)
        ResizedRow(r.media_id, w, h,
          java.util.Arrays.copyOf(r.bytes, math.min(outLen, r.bytes.length)))
      }
    }
  }

  /** Video frame sampling: pick `n` evenly-spaced frame indices from the
    * decoded frame count and emit one feature vector per sampled frame
    * (one output row per frame — a generator/flatMap shape). */
  def frameSample(media: DataFrame, decoder: MediaDecoder, n: Int,
                  featureDim: Int = 8): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    implicit val inEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val meta = decoder.decode(r.kind, r.bytes)
        val frames = math.max(meta.nFrames, 1)
        val step = math.max(frames / n, 1)
        (0 until math.min(n, frames)).map { i =>
          val frameIdx = i * step
          // frame features: decoder features salted by the frame index
          val f = decoder.features(r.kind, r.bytes, featureDim)
            .zipWithIndex.map { case (v, j) => v + frameIdx * 0.001f + j * 0f }
          FrameRow(r.media_id, frameIdx, f)
        }
      }
    }
  }
}

case class ResizedRow(media_id: Long, width: Int, height: Int, bytes: Array[Byte])
case class FrameRow(media_id: Long, frame_idx: Int, features: Array[Float])
