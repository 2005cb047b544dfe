package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus batch decode / feature-extract / frame-sample
 * operators. The Spark-side contract — schema, partition-preserving
 * mapPartitions batch shape, output signature — is real and tested; the
 * media decode itself is STUBBED deterministically (no media libraries in
 * this environment): `decodeStub` derives pseudo-features from payload
 * bytes. Swap `decodeStub` for a real JNI/FFmpeg/ImageIO call at
 * deployment; nothing else changes.
 *
 * At 100 TB the payloads dominate: all operators below are
 * narrow (no shuffle), stream one partition at a time, and never hold more
 * than one row's payload plus the running batch of fixed-size features.
 */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false)))

  /** Packs a string column into (id, payload BINARY, meta STRUCT) — the
    * canonical multimodal table shape. */
  def pack(df: DataFrame, idCol: String, dataCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(dataCol).cast(BinaryType).as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(dataCol)).as("n_bytes"),
        sha2(col(dataCol).cast(BinaryType), 256).as("content_sha")).as("meta"))

  /** Deterministic stand-in for a media decoder: folds payload bytes into a
    * fixed-dim float feature vector. Replace with the real decoder. */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /**
   * Batch feature extraction over the payload column: partition-preserving
   * mapPartitions (the Scala analog of `mapInPandas` batches — each task
   * streams its partition's rows through the decoder without shuffling).
   * Output: (media_id, feature ARRAY<FLOAT>).
   */
  def extractFeatures(packed: DataFrame, dim: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    packed.select(col("media_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Row(id, decodeStub(payload, dim).toSeq)
        }
      }(encoder)
  }

  /** Integer box-filter downsample by factor `k`: each output byte is the
    * integer mean (sum / window-length, floor) of its k-wide input window;
    * the tail window may be shorter and averages only what it covers. This
    * is a REAL 1-D scaler — the audio down-sampler / image row scaler over
    * a flat byte stream (a 2-D image applies it per axis given width
    * metadata) — not a decimation stub: every input byte contributes.
    * All-integer, so the full media chain stays exactly reproducible by a
    * byte-arithmetic oracle. */
  private[graft] def resizeBox(payload: Array[Byte], k: Int): Array[Byte] = {
    val n = (payload.length + k - 1) / k
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val start = i * k
      val end = math.min(payload.length, start + k)
      var s = 0
      var j = start
      while (j < end) { s += payload(j) & 0xff; j += 1 }
      out(i) = (s / (end - start)).toByte
      i += 1
    }
    out
  }

  /** Batch resize over the payload column — same partition-preserving
    * mapPartitions batch shape as [[extractFeatures]]: each task streams
    * its rows through the box-filter scaler, no shuffle, payloads never
    * accumulate. Output: (media_id, payload) with the resized bytes. */
  def resize(packed: DataFrame, k: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    packed.select(col("media_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        // null payloads carry no media — skipped, never NPE'd
        rows.flatMap { r =>
          Option(r.getAs[Array[Byte]](1))
            .map(p => Row(r.getLong(0), resizeBox(p, k)))
        }
      }(encoder)
  }

  /** INTEGER per-frame features: the payload splits into `frameBytes`
    * windows, every `stride`-th frame is kept, and each kept frame yields a
    * `dim`-long vector of byte sums bucketed by in-frame offset mod dim.
    * Integer accumulation makes the whole media chain (resize → frame →
    * feature → pooled clip embedding) EXACT — the float decode path
    * ([[extractFeatures]]) is order-sensitive and belongs to deployment,
    * not to a hash-gated oracle. Same narrow mapPartitions shape. */
  def frameFeatures(packed: DataFrame, frameBytes: Int = 64, stride: Int = 2,
      dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("feature", ArrayType(LongType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    packed.select(col("media_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          // null/empty payloads yield NO frames (a zero-byte clip has no
          // content — and an invented all-zero frame would diverge from
          // any byte-arithmetic oracle)
          val nFrames =
            if (payload == null) 0
            else (payload.length + frameBytes - 1) / frameBytes
          (0 until nFrames).iterator.filter(_ % stride == 0).map { f =>
            val acc = new Array[Long](dim)
            var j = f * frameBytes
            val end = math.min(payload.length, (f + 1) * frameBytes)
            while (j < end) {
              acc((j - f * frameBytes) % dim) += (payload(j) & 0xff).toLong
              j += 1
            }
            Row(id, f, acc.toSeq)
          }
        }
      }(encoder)
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the payload
    * as its own row (media_id, frame_no, frame BINARY) — pure column
    * algebra, stays in codegen, no decode needed for the slicing itself. */
  def sampleFrames(packed: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    packed.select(col("media_id"), col("payload"),
        ((octet_length(col("payload")) + frameBytes - 1) / frameBytes).cast(IntegerType).as("n"))
      .select(col("media_id"),
        posexplode(transform(
          filter(sequence(lit(0), col("n") - 1), i => i % stride === 0),
          i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_no", "frame")))
}
