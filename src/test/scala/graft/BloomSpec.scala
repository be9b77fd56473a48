package graft

import graft.functions.BloomAgg
import org.apache.spark.sql.functions._

/** BloomAgg: the no-false-negative guarantee the prefilter→exact-verify
  * pipeline rests on, the false-positive budget, and the distributed
  * build agreeing with a local one.
  */
class BloomSpec extends SparkSpec {

  test("no false negatives ever; false-positive rate within budget") {
    val rnd = new scala.util.Random(42)
    val n = 10000
    val inserted = Array.fill(n)((rnd.nextLong(), rnd.nextLong()))
    val mBits = BloomAgg.sizeFor(n)
    val bits = new Array[Long](mBits >>> 6)
    inserted.foreach { case (h1, h2) =>
      BloomAgg.setBits(bits, BloomAgg.K, h1, h2)
    }
    // every inserted element must probe true — a Bloom filter's defining
    // one-sided guarantee (reduce sets bits, merge ORs, nothing clears)
    assert(inserted.forall { case (h1, h2) =>
      BloomAgg.mightContain(bits, BloomAgg.K, h1, h2)
    })
    // fresh random pairs: fp rate ~1.4e-3 at 16 bits/element, assert <1%
    val probes = 100000
    val fps = (0 until probes).count { _ =>
      BloomAgg.mightContain(bits, BloomAgg.K, rnd.nextLong(), rnd.nextLong())
    }
    assert(fps < probes / 100, s"fp rate too high: $fps/$probes")
  }

  test("distributed build over partitions equals a local single-pass build") {
    import spark.implicits._
    val n = 5000
    val mBits = BloomAgg.sizeFor(n)
    val rnd = new scala.util.Random(7)
    val pairs = Array.fill(n)((rnd.nextLong(), rnd.nextLong()))
    val local = new Array[Long](mBits >>> 6)
    pairs.foreach { case (h1, h2) =>
      BloomAgg.setBits(local, BloomAgg.K, h1, h2)
    }
    val buildDf = spark.createDataset(pairs.toSeq).repartition(8)
      .select(new BloomAgg(mBits, BloomAgg.K).toColumn)
    val distributed = buildDf.head()
    assert(distributed.sameElements(local),
      "OR-merged partial bitsets must equal the sequential build")
    // the build's single-partition funnel is BOUNDED because partial
    // aggregation reduces each partition to one m/8-byte buffer before
    // the merge — assert the two-phase plan (this is the justification
    // behind dedup_bloom_decontam's hygiene-whitelist note in PlanSpec)
    val p = buildDf.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("partial_"),
      s"bloom build must partial-aggregate per partition:\n${p.take(1500)}")
  }

  test("bloom prefilter drops most non-matching shingles but keeps every match") {
    val docs = Tables.spread(Tables.load(spark, sf(), "documents"))
    val sh5 = docs.select(col("doc_id"), col("source"),
      explode(graft.functions.VectorFunctions.shingles(col("text"), 5)).as("sh"))
    val msrc = docs.agg(min(col("source"))).head().getString(0)
    val evalSh = sh5.filter(col("source") === msrc).select(col("sh")).distinct()
    val trainSh = sh5.filter(col("source") =!= msrc)
      .select(col("doc_id"), col("sh"))
    // the SAME shared build + probe path the batch gate query and the
    // streaming twin use
    val bits = BloomAgg.buildFrom(evalSh, "sh")
    val survivors = BloomAgg.prefilter(trainSh, "sh", bits)
    // soundness: the survivor set contains EVERY train shingle that
    // actually occurs in the eval set (no false negatives end-to-end,
    // through the same xxhash64 derivation the gate query uses)
    val missed = trainSh.join(evalSh, "sh")
      .exceptAll(survivors.join(evalSh, "sh")).count()
    assert(missed == 0L, s"bloom prefilter dropped $missed true matches")
    // effectiveness: non-matching shingles mostly filtered out
    val total = trainSh.count()
    val kept = survivors.count()
    val matches = trainSh.join(evalSh, "sh").count()
    assert(kept < matches + (total - matches) / 10,
      s"prefilter too weak: kept $kept of $total (true matches $matches)")
  }

  test("shingle kernel keeps empty tokens exactly like split() on doubled/trailing spaces") {
    // cross-engine pin: the native shingle kernel must tokenize exactly
    // like Spark's split() (and DuckDB's string_split, the oracle side) —
    // BOTH keep interior and trailing empty tokens. A kernel that drops
    // trailing empties would pass a ≥n-token split()-based filter yet
    // yield an EMPTY shingle set for texts ending in doubled/trailing
    // spaces: a 0-size Jaccard denominator and a red retrieval gate on
    // any corpus with sloppy whitespace.
    import spark.implicits._
    val texts = Seq(
      "a  b c",        // doubled interior space → empty token inside
      "a b c ",        // trailing space → trailing empty token
      "a b  ",         // doubled trailing
      "  a b",         // leading empties
      " ",             // all empty tokens
      "a b c d e")     // clean control
    val df = texts.toDF("text")
    val toks = split(col("text"), " ", -1)
    val compositional = df.select(
      when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(toks) - 3),
          i => array_join(slice(toks, i + 1, lit(3)), " "))))
        .as("expected"),
      graft.functions.VectorFunctions.shingles(col("text"), 3).as("got"))
    compositional.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel diverges from split(): expected=${r.getSeq[String](0)} got=${r.getSeq[String](1)}")
    }
  }
}
