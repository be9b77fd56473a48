package graft

import java.nio.file.{Files, Paths}
import graft.sqlfront.{GraftSession, StatementSplitter}

/** Interactive / scripted SQL shell over [[GraftSession]] — the local
  * analogue of the reference's psql entry point (reference
  * postgres/PostgresConnectionHandler.java owns the wire; here the
  * terminal talks to the session directly). Reads a script file when an
  * argument is given, stdin otherwise; statements execute one at a time
  * so an error prints and the loop continues, like psql without
  * ON_ERROR_STOP. Meta-commands (`\dt`, `\d t`, `\df`, …) go through the
  * session's own handler.
  *
  *   sbt "runMain graft.Shell [script.sql] [warehouseDir]"
  */
object Shell {

  /** psql-ish aligned rendering, driver-bounded: take(maxRows+1) pulls at
    * most maxRows+1 rows regardless of result size. */
  def render(df: org.apache.spark.sql.DataFrame, maxRows: Int = 50): String = {
    val cols = df.columns.toSeq
    val raw = df.take(maxRows + 1)
    val shown = raw.take(maxRows)
      .map(_.toSeq.map(v => if (v == null) "" else v.toString))
    val widths = cols.indices
      .map(i => (cols(i).length +: shown.map(_(i).length)).max)
    def line(vals: Seq[String]) =
      vals.lazyZip(widths).map((v, w) => v.padTo(w, ' ')).mkString(" | ")
    val sep = widths.map("-" * _).mkString("-+-")
    val more = if (raw.length > maxRows) s" (display truncated at $maxRows)" else ""
    ((line(cols) +: sep +: shown.map(line)) :+
      s"(${shown.length} row${if (shown.length == 1) "" else "s"})$more").mkString("\n")
  }

  /** Split `script` and execute statement-by-statement; errors are
    * reported through `out` and do not stop the run. Returns the number
    * of failed statements (process exit code material). */
  def runScript(gs: GraftSession, script: String, out: String => Unit): Int = {
    var failures = 0
    StatementSplitter.split(script).foreach { stmt =>
      try out(render(gs.sql(stmt)))
      catch {
        case e: Exception =>
          failures += 1
          out(s"ERROR: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
      }
    }
    failures
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-shell")
    val wh = args.lift(1).map(Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft_shell_wh"))
    val gs = new GraftSession(spark, wh)
    val script = args.headOption match {
      case Some(f) => new String(Files.readAllBytes(Paths.get(f)), "UTF-8")
      case None => scala.io.Source.stdin.mkString
    }
    val failures = runScript(gs, script, println)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
