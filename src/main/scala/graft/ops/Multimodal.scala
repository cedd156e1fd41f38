package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs per
  * partition in batches.
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * [[FakeCodec.decode]] derives deterministic pseudo-features from the bytes.
  * Everything Spark-side — schema, Encoders, partition-batch shape — is real.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class DecodedRow(id: Long, n_bytes: Long, first_byte: Int, format: String,
                              width: Int, height: Int, feature: Array[Double])

  /** STUB codec: a real deployment would swap this for an image/audio decoder
    * invoked per partition-batch. Deterministic on input bytes.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte], format: String): (Int, Int, Array[Double]) = {
      val n = bytes.length
      val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(0)) % 64)
      val h = 16 + (n % 64)
      val feat = Array.tabulate(8) { i =>
        if (n == 0) 0.0
        else java.lang.Byte.toUnsignedInt(bytes(i % n)).toDouble / 255.0
      }
      (w, h, feat)
    }
  }

  /** Wrap a text/id frame as a media frame (binary payload + format tag) —
    * the ingestion shape a real pipeline would produce from raw files.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      col(payloadCol).cast(BinaryType).as("media"),
      lit(format).as("format"))

  /** Decode via mapPartitions — batch-per-partition, no shuffle; the decode
    * stub is the only non-Catalyst step (unavoidable for a native codec).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, feat) = FakeCodec.decode(r.media, r.format)
        DecodedRow(r.id, r.media.length.toLong,
          if (r.media.isEmpty) -1 else java.lang.Byte.toUnsignedInt(r.media(0)),
          r.format, w, h, feat)
      }
    }
  }

  final case class ResizedRow(id: Long, width: Int, height: Int, media: Array[Byte])

  /** Resize STUB: a real codec would decode → scale → re-encode; the fake
    * deterministically truncates/pads the payload to width*height bytes so
    * the Spark-side shape (binary in, binary out, per-partition batches) is
    * real and testable.
    */
  def resize(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val out = java.util.Arrays.copyOf(r.media, width * height)
        ResizedRow(r.id, width, height, out)
      }
    }
  }

  final case class FrameRow(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Frame-sample STUB: treats the payload as `frameCount` fixed-size frames
    * and emits every `stride`-th one — the flatMap/explode shape of real
    * video sampling, with a deterministic fake splitter.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameCount: Int, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val frameSize = math.max(1, r.media.length / math.max(1, frameCount))
      (0 until frameCount by stride).map { i =>
        val from = math.min(i * frameSize, r.media.length)
        val until = math.min(from + frameSize, r.media.length)
        FrameRow(r.id, i, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }
}
