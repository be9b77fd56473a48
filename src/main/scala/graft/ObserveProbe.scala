package graft

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.functions._

/** Dev probe for the round-18 DML job-fusion design: can the
  * validateBatch aggregate set ride the snapshot WRITE job via
  * Dataset.observe (CollectMetrics) instead of running as its own
  * collect job? Checks (1) the aggregate shapes are accepted —
  * min(string), conditional sums, count, size(collect_set(struct)) as
  * the countDistinct replacement; (2) the metrics come back correct on
  * a parquet write action; (3) job count for observe+write vs
  * agg-collect + write.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("observeprobe")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    spark.range(100000).selectExpr("sum(id)").collect() // warmup

    val df = Seq((1, "a", 5.0), (2, "b", 6.0), (3, null.asInstanceOf[String], 7.0), (2, "b", 8.0))
      .toDF("id", "name", "v")
    val tmp = java.nio.file.Files.createTempDirectory("obsprobe").toString

    // --- observe-fused write
    Thread.sleep(200)
    val j0 = jobs.get()
    val obs = Observation("probe1")
    val t0 = System.nanoTime()
    val observed = df.observe(obs,
      min(when(col("name").isNull, lit("NOT NULL violation: name")))
        .as("viol"),
      count(when(col("id").isNotNull, lit(1))).as("cnt0"),
      size(collect_set(when(col("id").isNotNull, struct(col("id"))))).as("dst0"),
      sum(when(col("v") > 6.5, 1L).otherwise(0L)).as("tag_hi"),
      count(lit(1)).as("total"))
    observed.coalesce(1).write.mode("overwrite").parquet(tmp + "/fused")
    val m: Map[String, Any] = obs.get
    val fusedSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    val fusedJobs = jobs.get() - j0
    println(s"[obsprobe] fused: metrics=$m jobs=$fusedJobs sec=$fusedSec")
    assert(m("viol") == "NOT NULL violation: name", "viol")
    assert(m("cnt0") == 4L, "cnt0")
    assert(m("dst0") == 3, "dst0 " + m("dst0"))
    assert(m("tag_hi") == 2L, "tag_hi")
    assert(m("total") == 4L, "total")

    // --- classic two-job path (agg collect + write)
    Thread.sleep(200)
    val j1 = jobs.get()
    val t1 = System.nanoTime()
    val r = df.agg(
      min(when(col("name").isNull, lit("NOT NULL violation: name"))).as("viol"),
      count(when(col("id").isNotNull, lit(1))).as("cnt0"),
      countDistinct(when(col("id").isNotNull, struct(col("id")))).as("dst0"),
      sum(when(col("v") > 6.5, 1L).otherwise(0L)).as("tag_hi"),
      count(lit(1)).as("total")).collect()(0)
    df.coalesce(1).write.mode("overwrite").parquet(tmp + "/classic")
    val classicSec = (System.nanoTime() - t1) / 1e9
    Thread.sleep(300)
    val classicJobs = jobs.get() - j1
    println(s"[obsprobe] classic: metrics=$r jobs=$classicJobs sec=$classicSec")

    // --- repeat both 5x for steady state
    (1 to 5).foreach { i =>
      val ja = jobs.get(); val ta = System.nanoTime()
      val ob = Observation(s"probe1_$i")
      df.observe(ob, min(when(col("name").isNull, lit("x"))).as("viol"),
          count(lit(1)).as("total"))
        .coalesce(1).write.mode("overwrite").parquet(tmp + s"/f$i")
      ob.get
      val fa = (System.nanoTime() - ta) / 1e9
      Thread.sleep(150)
      val jb = jobs.get(); val tb = System.nanoTime()
      df.agg(min(when(col("name").isNull, lit("x"))).as("viol"),
        count(lit(1)).as("total")).collect()
      df.coalesce(1).write.mode("overwrite").parquet(tmp + s"/c$i")
      val fb = (System.nanoTime() - tb) / 1e9
      Thread.sleep(150)
      println(f"[obsprobe] rep$i fused ${jb - ja} jobs $fa%.3f s | classic ${jobs.get() - jb} jobs $fb%.3f s")
    }
    spark.stop()
  }
}
