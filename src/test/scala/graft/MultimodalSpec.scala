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
