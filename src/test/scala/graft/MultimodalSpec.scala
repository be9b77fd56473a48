package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, payload integrity, stubbed decode shape
  * and determinism, partition parallelism. */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaTable(
    Tables.load(spark, sf(), "documents"))

  test("media table schema: binary payload + typed metadata struct") {
    val df = media
    val f = df.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.select(col("meta.width")).first().getInt(0) >= 64)
  }

  test("payload bytes round-trip the source text") {
    val r = media.select(col("doc_id"), decode(col("payload"), "UTF-8").as("t"))
      .join(Tables.load(spark, sf(), "documents"), "doc_id")
      .filter(col("t") =!= col("text"))
    assert(r.count() == 0)
  }

  test("stub decode is deterministic, partition-parallel, fixed-width") {
    val a = Multimodal.decodeFeaturesStub(media.repartition(8)).collect()
      .sortBy(_.doc_id)
    val b = Multimodal.decodeFeaturesStub(media.repartition(3)).collect()
      .sortBy(_.doc_id)
    assert(a.length == b.length && a.length > 0)
    assert(a.forall(_.features.length == 4))
    // partitioning must not change results
    assert(a.zip(b).forall { case (x, y) =>
      x.doc_id == y.doc_id && x.features.sameElements(y.features) })
    // features are normalized into [0, 4]
    assert(a.forall(_.features.forall(v => v >= 0.0 && v <= 4.0)))
  }

  test("real PNG codec: round trip is lossless and matches the closed form") {
    val feats = Multimodal.pngFeatures(
        Tables.load(spark, sf(), "documents").limit(50))
      .collect().sortBy(_.doc_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.doc_id
      assert(f.w == (id % 64 + 8).toInt && f.h == (id % 48 + 8).toInt,
        "decoded dims echo the generated dims")
      assert(f.png_bytes > 0, "a real PNG payload was produced")
      // closed form of the pattern means (r is y-independent, g is
      // x-independent, b constant) — decoded means must equal them
      val er = (0 until f.w).map(x => (id + x) % 256).sum.toDouble / f.w
      val eg = (0 until f.h).map(y => (id + y) % 256).sum.toDouble / f.h
      assert(f.mean_r == er && f.mean_g == eg && f.mean_b == (id % 256).toDouble,
        s"doc $id: decoded means (${f.mean_r},${f.mean_g},${f.mean_b}) vs closed form ($er,$eg,${id % 256})")
    }
  }

  test("decodeImage: real PNG decodes; non-image payloads skip gracefully") {
    // a genuine 3x2 PNG with known pixels
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 2) img.setRGB(x, y, (10 << 16) | (20 << 8) | 30)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(Multimodal.decodeImage(out.toByteArray)
      .contains((3, 2, 10.0, 20.0, 30.0)))
    // text bytes (this corpus's payloads) are not an image: None, no throw
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("frame sampling emits every k-th frame only") {
    val fs = Multimodal.sampleFrames(media, 10)
    assert(fs.filter(col("frame_no") % 10 =!= 0).count() == 0)
    val one = fs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"),
        max(col("n_frames")).as("nf")).collect()
    assert(one.forall(r => r.getLong(1) == (r.getInt(2) + 9) / 10))
  }

  test("resize: payload truncated to the exact byte budget, prefix-preserving") {
    val rs = Multimodal.resize(media, 64, 64)
    // the resized payload length equals the declared budget, never
    // exceeds the original, and is a byte-exact prefix of it
    val bad = rs.join(media.select(col("doc_id"), col("payload").as("orig")), "doc_id")
      .filter(
        octet_length(col("resized_payload")).cast("long") =!= col("resized_bytes") ||
        col("resized_bytes") > octet_length(col("orig")).cast("long") ||
        expr("substring(orig, 1, cast(resized_bytes as int))") =!= col("resized_payload"))
      .count()
    assert(bad == 0L)
    // budget shrinks with source pixel count: bigger images lose more
    val r = rs.select(col("w") * col("h"), col("resized_bytes"),
      octet_length(col("resized_payload"))).collect()
    assert(r.nonEmpty)
  }
}
