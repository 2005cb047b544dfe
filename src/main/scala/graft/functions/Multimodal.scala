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
