package graft

import scala.collection.mutable.ArrayBuffer

/** Dev diagnostic for the optimization rounds: run named gate queries N
  * times in ONE JVM (decorrelating codegen/JIT warmup from the steady
  * state the bench's min-of-passes reports) and attribute wall-clock to
  * the Spark JOBS each run launches — job count × per-job seconds is the
  * first-order cost model for the session-script gates (ddl_*) whose
  * work is many tiny jobs, not one big one.
  *
  * Usage: runMain graft.OptProbe <sfDir> <repeats> <q1,q2,...>
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val wanted = args.lift(2).getOrElse("").split(",").filter(_.nonEmpty).toSet
    val spark = Engine.session("optprobe")
    val jobs = ArrayBuffer.empty[(Int, Long, String)] // id, millis, desc
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc.take(90))): Unit
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs += ((je.jobId, (System.nanoTime() - t0) / 1000000, d)): Unit }
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val sel = SparkEntry.queries.filter(kv => wanted(kv._1)).toSeq
    sel.foreach { case (name, fn) =>
      (1 to repeats).foreach { i =>
        val mark = jobs.synchronized(jobs.size)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120) // let listener events drain
        val mine = jobs.synchronized(jobs.drop(mark).toList)
        println(f"[optprobe] $name run$i: $sec%.3f s, rows=$n, jobs=${mine.size}")
        if (i == repeats)
          mine.sortBy(-_._2).take(14).foreach { case (id, ms, d) =>
            println(f"[optprobe]    job$id%4d ${ms}%6d ms  $d")
          }
      }
    }
    spark.stop()
  }
}
