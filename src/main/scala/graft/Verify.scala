package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional third arg (dev only): comma-separated query-name filter so a
    // single operator can be gate-checked without re-running all of them
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = Engine.session("graft-verify")
    new java.io.File(outDir).mkdirs()
    // A throwing query must be VISIBLE to the gate: collect failures and
    // dump them as _failed.json next to oracle_sql.json, so an absent
    // result directory reads as "failed with this exception", never as
    // "query does not exist" (the r9 failure mode: 57 broken queries
    // silently vanished from CORRECTNESS and 146/146 masqueraded as green).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) =
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Oracle DETERMINISM sweep, wired into the gate run itself (r16
    // verdict #8): every oracle re-executes 3x under the checker's own
    // settings (preserve_insertion_order=false); ANY row-order drift is
    // recorded as a [verify] failure + _failed.json entry, so a
    // nondeterministic oracle can never reach a green CORRECTNESS
    // artifact (the round-16 flaky-red class). A missing python/duckdb
    // toolchain SKIPS with a log line — the sweep is defense in depth on
    // top of the driver's own compare, not a new hard dependency.
    // GRAFT_STABILITY_N overrides the repeat count; 0 skips the sweep
    // entirely (the sf1-class decade sweeps re-run the SAME oracles the
    // sf0.01 gate already swept x3 — tripling an 85-minute heavyweight
    // replay buys no new determinism evidence)
    // malformed values SKIP with a note rather than crash the gate dump
    // mid-artifact (a NumberFormatException here would die after the
    // results but before _failed.json — the absent-artifact ambiguity
    // this file exists to prevent)
    val stabilityN = sys.env.get("GRAFT_STABILITY_N") match {
      case None => 3
      case Some(v) => scala.util.Try(v.trim.toInt).getOrElse {
        // honor the comment's contract: an unparseable override reads as
        // "operator tried to configure the sweep and failed" — skipping
        // (not defaulting to 3) is the safe reading, because the typo'd
        // intent is usually 0 on a decade fixture where a silent
        // default-3 means tripling an hours-long heavyweight replay
        System.err.println(
          s"[verify-stability] GRAFT_STABILITY_N='$v' unparseable — sweep skipped")
        0
      }
    }
    val stabilityTool = Paths.get("tools/check_oracle_stability.py")
    if (Files.exists(stabilityTool) && stabilityN > 0) {
      try {
        val pb = new ProcessBuilder(
          "python3", stabilityTool.toString, sfDir, outDir, stabilityN.toString)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val outText = new String(p.getInputStream.readAllBytes(), "UTF-8")
        val rc = p.waitFor()
        val tail = outText.linesIterator.toSeq.takeRight(5).mkString(" | ")
        if (rc == 3) // the tool's own SKIP contract (duckdb module absent)
          System.err.println(s"[verify-stability] sweep skipped: $tail")
        else if (rc != 0) {
          System.err.println(s"[verify] oracle_stability failed: $tail")
          failures("oracle_stability") = s"stability sweep rc=$rc: ${tail.take(500)}"
        } else System.err.println(s"[verify-stability] $tail")
      } catch { case e: Exception =>
        System.err.println(
          s"[verify-stability] sweep skipped (${e.getClass.getSimpleName}: ${e.getMessage})")
      }
    } else System.err.println(
      "[verify-stability] sweep skipped (tool not found or GRAFT_STABILITY_N=0)")
    val failedJson =
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failed.json"), failedJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
    spark.stop()
  }
}
