package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * run per-partition so one decoder instance is amortized over a whole
  * batch of rows (the Scala analog of a Pandas-UDF-over-mapInPandas
  * pipeline).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container — see `decodeStub`): the deterministic fake keeps schema,
  * partitioning, batch shape and the partition-local decoder lifecycle
  * real and testable; swapping in a real decoder touches only the stub.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),    // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true), // audio/video
    StructField("payload", BinaryType, nullable = false)))

  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

  /** Deterministic fake "decode + feature-extract": byte histogram
    * moments as a 4-dim feature. A real build replaces ONLY this
    * function with the codec call (??? marks the boundary).
    */
  private def decodeStub(kind: String, payload: Array[Byte]): Array[Float] = {
    // ??? real decoder goes here (JPEG/PNG decode, PCM frames, ...)
    if (payload.isEmpty) Array(0f, 0f, 0f, 0f)
    else {
      var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
      payload.foreach { b => val v = b & 0xff; sum += v; if (v > mx) mx = v; if (v < mn) mn = v }
      Array(payload.length.toFloat, sum.toFloat / payload.length, mn.toFloat, mx.toFloat)
    }
  }

  /** Per-partition decode: one decoder per partition, streamed rows —
    * the batch shape a heavyweight codec needs (NOT a per-row UDF). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init would happen once here, per partition
        rows.map { case (id, kind, payload) =>
          MediaFeature(id, kind, payload.length, decodeStub(kind, payload))
        }
      }
  }

  /** Deterministic frame sampling for video-like payloads: fixed-stride
    * chunking of the byte stream standing in for frame extraction —
    * partitioning and output schema are what a real sampler produces. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
          (id, i, chunk)
        }
      }.toDF("media_id", "frame_no", "frame_payload")
  }

  /** Build a synthetic media table from the documents table (payload =
    * UTF-8 bytes) — exercises the full plumbing on driver testdata. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"),
      encode(col("text"), "UTF-8").as("payload"))
}
