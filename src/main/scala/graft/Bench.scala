package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    // warm up JVM/codegen/file-index paths so per-query timings measure the
    // queries, not first-touch JIT + parquet footer reads
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // a failed query is recorded as a FAILURE (errors object + nonzero
    // failed count), never as a (fast) timing — the bench must not flatter
    // a regression
    // optional args = run only the named queries (local iteration);
    // the driver passes none and gets the full suite
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(kv => args.contains(kv._1)).toSeq
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // strip every JSON-forbidden char (quotes, backslash, ALL control
    // chars) — a multi-line Spark exception must not corrupt the record
    def jstr(s: String): String =
      "\"" + s.replaceAll("[\"\\\\\\x00-\\x1f]", " ") + "\""
    val passed = results.filter(_._3.isEmpty)
    val qs = passed.map { case (k, v, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = passed.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":${results.size - passed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
