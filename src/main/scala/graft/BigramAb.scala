package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-off same-JVM A/B probe for the bigram-LM build shapes (host
  * weather makes sequential whole-JVM comparisons useless — interleave
  * the two shapes in ONE session and compare mins, the round-16 pair
  * stage discipline).
  *
  *   A: instance-level scoring (the pre-r17-opt shape) — the corpus
  *      explode runs under the model build AND the scoring join.
  *   B: per-doc bigram bag (doc_id, g, k), ONE corpus explode, persisted;
  *      model and scoring both read the bag.
  *
  * Also asserts both shapes produce IDENTICAL (doc_id, n_bigrams,
  * surprise_q) rows before timing.
  */
object BigramAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Engine.session("bigram-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def shapeA(s: SparkSession): DataFrame = {
      val docs = Tables.spread(Tables.load(s, dir, "documents"))
      val toksArr = split(col("text"), " ")
      val toks = docs.select(col("doc_id"), explode(toksArr).as("w"))
      val vocab = toks.agg(countDistinct(col("w")).as("v"))
      val grams = docs.filter(size(toksArr) >= 2)
        .select(col("doc_id"), toksArr.as("t"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("g"))
      val cbg = grams.groupBy(col("g")).agg(count(lit(1)).as("cg"))
      val cprev = cbg.select(expr("split_part(g, ' ', 1)").as("prev"), col("cg"))
        .groupBy(col("prev")).agg(sum(col("cg")).as("cp"))
      grams.withColumn("prev", expr("split_part(g, ' ', 1)"))
        .join(cbg, "g").join(cprev, "prev")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          (-log((col("cg") + 1).cast("double") / (col("cp") + col("v")))).as("sur"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          floor(sum(col("sur").cast(DecimalType(38, 12))).cast("double") /
            count(lit(1)) * 1e6).cast("long").as("surprise_q"))
    }

    def shapeB(s: SparkSession): (DataFrame, DataFrame) = {
      val docs = Tables.spread(Tables.load(s, dir, "documents"))
      val toksArr = split(col("text"), " ")
      val toks = docs.select(col("doc_id"), explode(toksArr).as("w"))
      val vocab = toks.agg(countDistinct(col("w")).as("v"))
      val gdoc = docs.filter(size(toksArr) >= 2)
        .select(col("doc_id"), toksArr.as("t"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cbg = gdoc.groupBy(col("g")).agg(sum(col("k")).as("cg"))
      val cprev = cbg.select(expr("split_part(g, ' ', 1)").as("prev"), col("cg"))
        .groupBy(col("prev")).agg(sum(col("cg")).as("cp"))
      val scored = gdoc.withColumn("prev", expr("split_part(g, ' ', 1)"))
        .join(cbg, "g").join(cprev, "prev")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("k"),
          (-log((col("cg") + 1).cast("double") / (col("cp") + col("v")))).as("sur"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_bigrams"),
          floor(sum(col("sur").cast(DecimalType(20, 12)) *
              col("k").cast(DecimalType(12, 0))).cast("double") /
            sum(col("k")) * 1e6).cast("long").as("surprise_q"))
      (scored, gdoc)
    }

    // equivalence first: bit-identical rows or the timing is meaningless
    val a = shapeA(spark).orderBy(col("doc_id")).collect()
    val (bDf, sc0) = shapeB(spark)
    val b = bDf.orderBy(col("doc_id")).collect()
    sc0.unpersist()
    require(a.length == b.length, s"row count ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => require(x == y, s"row mismatch: $x vs $y") }
    println(s"[ab] shapes agree on ${a.length} rows")

    val tA = Array.newBuilder[Double]
    val tB = Array.newBuilder[Double]
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      shapeA(spark).count()
      tA += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (sb, sc) = shapeB(spark)
      sb.count()
      sc.unpersist()
      tB += (System.nanoTime() - t1) / 1e9
    }
    def fmt(xs: Array[Double]) =
      f"min=${xs.min}%.2f all=" + xs.map(x => f"$x%.2f").mkString(",")
    println(s"[ab] A (instance): ${fmt(tA.result())}")
    println(s"[ab] B (bag):      ${fmt(tB.result())}")
    spark.stop()
  }
}
