package graft

/** Dev diagnostic: write `.explain("formatted")` for named gate queries to
  * an output directory — the per-round plan evidence the optimization
  * rounds commit under plans/r<NN>/ (one `<query>_<tag>.txt` per query).
  *
  * Queries that materialize eagerly inside their body (iterative loops
  * ending in localCheckpoint, session DDL scripts) return a stub
  * `Scan ExistingRDD` plan; for those the interesting plans are the ones
  * EXECUTED along the way, so a QueryExecutionListener appends every
  * executed query's formatted plan (in execution order) after the
  * returned-DataFrame plan.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <query>[,<query>...]
  * A query name of `all` dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/scratch")
    val tag = args.lift(2).getOrElse("before")
    val wanted = args.lift(3).getOrElse("all").split(",").toSet
    val spark = Engine.session("plandump")
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    val executed = new java.lang.StringBuilder
    val capture = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        if (capture.get) executed.synchronized {
          executed.append(s"\n\n==== executed ($fn, ${ns / 1000000} ms) ====\n")
            .append(qe.explainString(org.apache.spark.sql.execution.FormattedMode)): Unit
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val sel =
      if (wanted("all")) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(kv => wanted(kv._1)).toSeq
    sel.foreach { case (name, fn) =>
      try {
        // reset under the same lock the async listener appends with — a
        // late-draining event from the previous query must not interleave
        // with the reset and leak a stale plan into this query's dump
        executed.synchronized(executed.setLength(0))
        capture.set(true)
        val df = fn(spark, sfDir)
        capture.set(false)
        Thread.sleep(200) // listener fires asynchronously; let it drain
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val body = "==== returned DataFrame ====\n" + txt +
          executed.synchronized(executed.toString)
        java.nio.file.Files.write(
          out.resolve(s"${name}_$tag.txt"), body.getBytes("UTF-8"))
        println(s"[plandump] wrote ${name}_$tag.txt")
      } catch { case e: Throwable =>
        capture.set(false)
        println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
