package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-piece wall-clock attribution for the winnow-containment
  * pipeline (dedup_winnow) and the frame-dedup twin (mm_frame_dedup) —
  * which of fpdoc-build / rare-filter / self-join / final-joins actually
  * costs, on data this small (hundreds of docs, thousands of rows).
  * Usage: runMain graft.WinnowAb [sfDir] [reps]
  */
object WinnowAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session("winnowab")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { a <- si.completionTime; b <- si.submissionTime }
          yield a - b).getOrElse(-1L)
        if (wall > 100)
          println(f"[winnowab-stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall}%5d ms run=${si.taskMetrics.executorRunTime}%5d ms " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%5d ms " +
            f"deser=${si.taskMetrics.executorDeserializeTime}%4d ms ${si.name.take(60)}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    // same-JVM spread-vs-no-spread A/B on the fpdoc build alone
    def fpdocBuild(spread: Boolean): Double = {
      val base = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 500)
      val src = if (spread) Tables.spread(base) else base
      val t0 = System.nanoTime()
      val n = src
        .select(col("doc_id"), lower(trim(col("text"))).as("s"))
        .filter(length(col("s")) >= 11)
        .select(col("doc_id"),
          explode(graft.functions.WinnowFunctions.winnow(col("s"))).as("f"))
        .select(col("doc_id"), col("f.fp").as("fp"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val a = fpdocBuild(spread = false)
      val b = fpdocBuild(spread = true)
      println(f"[winnowab] fpdoc rep$i nospread=$a%.3f spread=$b%.3f")
    }

    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val fpdoc = graft.operators.TextQueries.winnowFpRows(spark, sfDir, 500)
        .select(col("doc_id"), col("f.fp").as("fp"))
        .distinct()
        .persist()
      val nfp = fpdoc.count()
      val t1 = System.nanoTime()
      val rare = fpdoc.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select(col("fp"))
      val fpr = fpdoc.join(rare, "fp").persist()
      val nfpr = fpr.count()
      val t2 = System.nanoTime()
      val sz = fpr.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
      val shared = fpr.select(col("fp"), col("doc_id").as("a"))
        .join(fpr.select(col("fp"), col("doc_id").as("b")), "fp")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3).persist()
      val nsh = shared.count()
      val t3 = System.nanoTime()
      val result = shared
        .join(sz.select(col("doc_id").as("a"), col("nfp").as("na")), "a")
        .join(sz.select(col("doc_id").as("b"), col("nfp").as("nb")), "b")
        .select(col("a"), col("b"), col("n_shared"),
          (col("n_shared").cast("double") / least(col("na"), col("nb")))
            .as("containment"))
        .filter(col("containment") >= 0.3)
        .orderBy(col("a"), col("b"))
      val nres = result.count()
      val t4 = System.nanoTime()
      println(f"[winnowab] rep$rep fpdoc=${(t1 - t0) / 1e9}%.3f ($nfp) " +
        f"rare+join=${(t2 - t1) / 1e9}%.3f ($nfpr) " +
        f"selfjoin=${(t3 - t2) / 1e9}%.3f ($nsh) " +
        f"final=${(t4 - t3) / 1e9}%.3f ($nres)")
      fpdoc.unpersist(); fpr.unpersist(); shared.unpersist()
    }
    spark.stop()
  }
}
