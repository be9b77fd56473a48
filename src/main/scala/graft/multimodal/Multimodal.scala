package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video as opaque `binary` payloads with typed metadata, and run
  * decode / feature-extraction as partition-parallel batch operations.
  *
  * Two decode paths:
  *   - [[pngFeatures]] / [[decodeImage]] — a REAL pure-JVM image codec
  *     (`javax.imageio` PNG): executor-side encode→decode round trip with
  *     channel statistics computed from the DECODED pixels, so the gate
  *     query's oracle (which replays the deterministic pixel pattern in
  *     SQL) verifies the codec is lossless end-to-end.
  *   - [[decodeFeaturesStub]] — the generic-codec placeholder for
  *     modalities this container has no library for (JPEG/WAV/MP4): a
  *     deterministic fake over the payload bytes, clearly marked.
  * Everything around both (schema, binary columns, metadata struct,
  * mapPartitions batch shape, partition parallelism) is the real 100 TB
  * design: payloads never reach the driver, features are computed
  * per-partition, and metadata-only queries never touch payload bytes
  * (parquet column pruning skips the binary column entirely).
  */
object Multimodal {

  /** Typed output of the real PNG round-trip decode. */
  final case class PngFeatures(
      doc_id: Long, w: Int, h: Int, png_bytes: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL JVM image decode: `ImageIO.read` over the payload bytes.
    * Returns (width, height, mean R/G/B of the decoded pixels), or None
    * when the payload is not a decodable image — the graceful-fallback
    * contract a mixed-media corpus needs (a corrupt or mislabeled
    * payload must skip, never kill the partition). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    try {
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file spill on executors
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        Some((w, h, sr / n, sg / n, sb / n))
      }
    } catch { case _: Exception => None }

  /** Real-codec feature extraction, fully distributed: per doc, render a
    * deterministic pixel pattern (r = (id+x)%256, g = (id+y)%256,
    * b = id%256), encode it to PNG and decode it back — both with
    * `javax.imageio`, executor-side — then compute channel means FROM THE
    * DECODED IMAGE. PNG is lossless, so the means must equal the
    * pattern's closed form; the oracle computes that closed form in SQL,
    * making the whole codec round trip hash-checked. Image dims stay
    * small (≤71×55) so per-row work is bounded; the pattern, encode,
    * decode and stats are all payload-local — nothing but the final
    * feature row ever moves. */
  def pngFeatures(docs: DataFrame): Dataset[PngFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the codec work is pure executor CPU on a narrow input (one long per
    // doc): a small compressed parquet arrives as ONE split, which would
    // run the whole encode+decode pass single-threaded — spread to the
    // cluster parallelism first (no-op when the file count already
    // provides enough splits, i.e. at real scale)
    graft.Tables.spread(docs.select(col("doc_id"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 64 + 8).toInt
        val h = (id % 48 + 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id + x) % 256).toInt
            val g = ((id + y) % 256).toInt
            val b = (id % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        javax.imageio.ImageIO.setUseCache(false)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        val png = out.toByteArray
        val (dw, dh, mr, mg, mb) = decodeImage(png).getOrElse(
          throw new IllegalStateException(s"PNG round trip failed for doc $id"))
        PngFeatures(id, dw, dh, png.length.toLong, mr, mg, mb)
      }
    }
  }

  /** Typed output of the payload-pixel PNG round trip. */
  final case class PayloadPngFeatures(
      doc_id: Long, w: Int, h: Int, png_bytes: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL codec over REAL payload bytes: each document's payload bytes
    * become the pixel data of a 32×24 image (r/g/b of pixel i = payload
    * byte (i)/(i+1)/(i+2) mod len — every byte of a short payload is
    * sampled, long payloads wrap), the image is PNG-ENCODED and then
    * PNG-DECODED with `javax.imageio` on the executors, and channel
    * means are computed FROM THE DECODED PIXELS. The input to the decode
    * step is a genuine PNG binary column derived from corpus bytes — not
    * a synthetic gradient — and PNG's losslessness means the decoded
    * means must equal the closed form over the payload bytes, which the
    * oracle replays in SQL (pure-ASCII corpus: ord(char) = byte). A codec
    * bug, channel swap, or lossy write hash-mismatches the gate. All
    * work is payload-local mapPartitions; only the feature row moves. */
  def payloadPngFeatures(media: DataFrame): Dataset[PayloadPngFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.Tables.spread(media.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, raw) =>
          val bytes = if (raw.isEmpty) Array[Byte](0) else raw
          val len = bytes.length
          val (w, h) = (32, 24)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y * w + x
              val r = bytes(i % len) & 0xff
              val g = bytes((i + 1) % len) & 0xff
              val b = bytes((i + 2) % len) & 0xff
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          javax.imageio.ImageIO.setUseCache(false)
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          val png = out.toByteArray
          val (dw, dh, mr, mg, mb) = decodeImage(png).getOrElse(
            throw new IllegalStateException(s"payload PNG round trip failed for doc $id"))
          PayloadPngFeatures(id, dw, dh, png.length.toLong, mr, mg, mb)
        }
      }
  }

  /** One perceptual hash row: variant 0 = the original payload-pixel
    * tile, variant 1 = its ÷2 resized re-encode. */
  final case class PerceptualHash(doc_id: Long, variant: Int, dhash: Long)

  /** PNG encode → decode round trip through the real JVM codec. */
  private def pngRoundTrip(img: java.awt.image.BufferedImage,
      id: Long): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))).getOrElse(
      throw new IllegalStateException(s"PNG round trip failed for doc $id"))
  }

  /** 64-bit difference hash over a 9×8 luma-block grid: block (r, c) is a
    * `cw`×`ch` pixel rectangle, its luma is the integer sum of
    * 299·R + 587·G + 114·B over the block (no division — comparing sums
    * of EQUAL-SIZED blocks is comparing means, and integers keep the
    * oracle replay bit-exact), and bit r·8+c is set when block (r, c+1)
    * outweighs block (r, c). The gradient structure survives resizing
    * and re-encoding — the invariance byte hashing lacks. */
  private def dhash64(img: java.awt.image.BufferedImage, cw: Int, ch: Int): Long = {
    val s = Array.ofDim[Long](8, 9)
    var br = 0
    while (br < 8) {
      var bc = 0
      while (bc < 9) {
        var acc = 0L
        var y = br * ch
        while (y < (br + 1) * ch) {
          var x = bc * cw
          while (x < (bc + 1) * cw) {
            val rgb = img.getRGB(x, y)
            acc += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        s(br)(bc) = acc
        bc += 1
      }
      br += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (s(r)(c + 1) > s(r)(c)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Perceptual (dHash) fingerprints over the REAL decode path, closing
    * the gap byte-exact dedup ([[mm_dedup_payload]]) and frame hashing
    * can't: a re-encoded or resized duplicate shares no bytes with its
    * original, but its luma gradients — and so its dHash — survive.
    *
    * Per image doc, two variants flow through the actual javax.imageio
    * codec: (0) the payload bytes rendered as a 36×48 RGB tile (same
    * pixel convention as [[payloadPngFeatures]]: channel j of pixel i =
    * payload byte (i+j) mod len), PNG-encoded and decoded back; (1) a
    * REAL ÷2 resize of the decoded tile (channel-wise truncated 2×2
    * mean), re-encoded and re-decoded. Both hashes are computed FROM
    * DECODED PIXELS, so the whole encode→resize→re-encode→decode chain
    * is inside the verified path. Dimensions are chosen so every stage
    * stays integer-exact (36 = 9·4, 48 = 8·6; halved: 18 = 9·2,
    * 24 = 8·3), which lets the gate oracle replay pixels → luma →
    * blocks → bits declaratively.
    *
    * All work is payload-local mapPartitions; two 12-byte rows per doc
    * are the only thing that ever moves. */
  def perceptualHashes(media: DataFrame): Dataset[PerceptualHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.Tables.spread(
        media.filter(col("modality") === "image").select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.flatMap { case (id, raw) =>
          val bytes = if (raw.isEmpty) Array[Byte](0) else raw
          val len = bytes.length
          val (w, h) = (36, 48)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y * w + x
              val r = bytes(i % len) & 0xff
              val g = bytes((i + 1) % len) & 0xff
              val b = bytes((i + 2) % len) & 0xff
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val decodedA = pngRoundTrip(img, id)
          val hashA = dhash64(decodedA, 4, 6)
          // real resize: channel-wise truncated mean of each 2×2 block of
          // the DECODED original, then its own encode→decode round trip
          val small = new java.awt.image.BufferedImage(
            w / 2, h / 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y2 = 0
          while (y2 < h / 2) {
            var x2 = 0
            while (x2 < w / 2) {
              var (sr, sg, sb) = (0, 0, 0)
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val rgb = decodedA.getRGB(x2 * 2 + dx, y2 * 2 + dy)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  dx += 1
                }
                dy += 1
              }
              small.setRGB(x2, y2, ((sr / 4) << 16) | ((sg / 4) << 8) | (sb / 4))
              x2 += 1
            }
            y2 += 1
          }
          val hashB = dhash64(pngRoundTrip(small, id), 2, 3)
          Seq(PerceptualHash(id, 0, hashA), PerceptualHash(id, 1, hashB))
        }
      }
  }

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

  /** ONE definition of the 64-byte pseudo-frame convention, shared by
    * frame sampling and frame-level dedup: every video payload with its
    * frame count and one row per frame index k ∈ [1, nf]. Payloads
    * shorter than one frame yield no rows (Spark's sequence() would
    * otherwise produce a DESCENDING [0,-1] for nf = 0). */
  def videoFrameIndex(media: DataFrame): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("payload"),
        (octet_length(col("payload")) / 64).cast("int").as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), col("payload"), col("nf"),
        explode(sequence(lit(1), col("nf"))).as("k"))

  /** Frame sampling for video payloads: 64-byte pseudo-frames, every k-th
    * sampled. The explode is partition-local; at scale the fan-out rows
    * carry only (doc_id, frame_no) plus the per-frame slice. */
  def sampleFrames(media: DataFrame, every: Int): DataFrame =
    videoFrameIndex(media)
      .select(col("doc_id"), col("nf").as("n_frames"),
        (col("k") - 1).as("frame_no"))
      .filter(col("frame_no") % every === 0)
}
