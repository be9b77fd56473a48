package graft

import java.nio.file.{Files, Paths}
import graft.sqlfront.{GraftSession, PgWire, SqlHttp}

/** Long-running server entry point: one GraftSession exposed over BOTH
  * network surfaces — the PostgreSQL wire protocol ([[graft.sqlfront.PgWire]],
  * for psql/JDBC-style clients) and HTTP ([[graft.sqlfront.SqlHttp]],
  * POST /sql) — sharing a single warehouse and catalog, the same pairing
  * the reference runs (reference postgres/PostgresProtocolServer.java +
  * SQLController.java).
  *
  *   sbt "runMain graft.Server [pgPort] [httpPort] [warehouseDir]"
  */
object Server {
  def main(args: Array[String]): Unit = {
    val pgPort = args.lift(0).map(_.toInt).getOrElse(5432)
    val httpPort = args.lift(1).map(_.toInt).getOrElse(8080)
    val wh = args.lift(2).map(Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft_server_wh"))
    val spark = Engine.session("graft-server")
    val gs = new GraftSession(spark, wh)
    val wire = PgWire.start(gs, pgPort)
    val http = SqlHttp.start(gs, httpPort)
    println(s"graft server: pg wire on 127.0.0.1:${wire.boundPort}, " +
      s"http on 127.0.0.1:${http.getAddress.getPort}, warehouse $wh")
    // serve until the process is killed; sockets run on daemon/executor
    // threads, so the main thread just parks
    Thread.currentThread().join()
  }
}
