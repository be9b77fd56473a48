package graft
/** Dev diagnostic: execute every gate query at a small SF and report
  * final-adaptive-plan stats that suggest duplicated work — multiple
  * explodes with no exchange reuse, heavy repeat scans of one file. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("planaudit")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
      try {
        val df = f(spark, dir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        val gens = "Generate ".r.findAllIn(p).length
        val reused = "ReusedExchange".r.findAllIn(p).length
        val scans = "FileScan parquet".r.findAllIn(p).length
        val winUnpart = "windowspecdefinition\\(".r.findAllIn(p).length
        if (gens >= 2 || scans >= 3)
          println(s"""AUDIT {"q":"$n","generates":$gens,"reused":$reused,"scans":$scans,"winspecs":$winUnpart}""")
      } catch { case e: Throwable =>
        println(s"""AUDIT {"q":"$n","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
