package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video as opaque `binary` payloads with typed metadata, and run
  * decode / feature-extraction as partition-parallel batch operations.
  *
  * The decode step is a STUB — this container has no image/audio codecs —
  * implemented as a deterministic fake over the payload bytes, clearly
  * marked below. Everything around it (schema, binary columns, metadata
  * struct, mapPartitions batch shape, partition parallelism) is the real
  * 100 TB design: payloads never reach the driver, features are computed
  * per-partition, and metadata-only queries never touch payload bytes
  * (parquet column pruning skips the binary column entirely).
  */
object Multimodal {

  /** Case class for the typed decode output. */
  final case class MediaFeatures(
      doc_id: Long, modality: String, n_bytes: Long, features: Array[Double])

  /** Synthesize a multimodal table from `documents`: payload = UTF-8 bytes
    * of the text standing in for media bytes; modality cycled; metadata
    * struct with deterministic width/height/duration. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        (col("n_chars") / 8).cast("double").as("duration_s")).as(("meta")))

  /** STUB DECODE — deterministic fake feature extractor.
    *
    * A real deployment would decode the payload (JPEG/WAV/MP4) here with a
    * native library and emit embeddings; the container has none, so the
    * "features" are a fixed-size deterministic function of the raw bytes.
    * The Spark-side contract is the real one: partition-parallel
    * `mapPartitions` over a typed Dataset, one in-memory batch per
    * partition, no driver involvement, fixed output schema.
    */
  def decodeFeaturesStub(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mod, bytes) =>
          // ---- STUB: replace with real codec + model inference ----
          val f = new Array[Double](4)
          var i = 0
          while (i < bytes.length) {
            f(i % 4) += (bytes(i) & 0xff).toDouble / 255.0
            i += 1
          }
          val n = math.max(bytes.length, 1)
          MediaFeatures(id, mod, bytes.length.toLong, f.map(v => v / n * 4.0))
          // ---- end STUB ----
        }
      }
  }

  /** STUB RESIZE — target-box "resize" of image payloads.
    *
    * A real deployment decodes, scales to (tw, th) and re-encodes; the
    * container has no codecs, so the stand-in contract is: the byte
    * budget scales with the target/source pixel ratio (never below 1,
    * never above the original) and the "resized" payload is the prefix
    * of the original at that budget. Deterministic, payload-local,
    * distributed — the Spark-side plumbing (binary slicing inside the
    * executor, metadata arithmetic in the plan) is the real thing. */
  def resize(media: DataFrame, tw: Int, th: Int): DataFrame =
    media.filter(col("modality") === "image")
      .select(col("doc_id"), col("meta.width").as("w"), col("meta.height").as("h"),
        col("payload"))
      .withColumn("scale",
        lit(tw.toDouble * th) / (col("w") * col("h")).cast("double"))
      .withColumn("resized_bytes",
        greatest(lit(1L), least(octet_length(col("payload")).cast("long"),
          ceil(octet_length(col("payload")) * col("scale")).cast("long"))))
      .withColumn("resized_payload",
        expr("substring(payload, 1, cast(resized_bytes as int))"))

  /** Frame sampling for video payloads: 64-byte pseudo-frames, every k-th
    * sampled. The explode is partition-local; at scale the fan-out rows
    * carry only (doc_id, frame_no) plus the per-frame slice. */
  def sampleFrames(media: DataFrame, every: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("payload"),
        (octet_length(col("payload")) / 64).cast("int").as("n_frames"))
      // payloads shorter than one frame yield no rows (Spark's sequence()
      // would otherwise produce a DESCENDING [0,-1] for n_frames=0)
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
      .filter(col("frame_no") % every === 0)
}
