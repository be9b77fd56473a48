package graft.sqlfront

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP entry point — the reference's second query lifecycle (reference
  * SQLController.java:11-31: a POST endpoint that routes a SQL string
  * into the query service and returns rows). Here it is a ~100-line shim
  * over [[GraftSession.sql]]: every capability (DDL, DML, transactions,
  * COPY, scripts) comes from the session, the endpoint only translates
  * HTTP ⇄ DataFrame.
  *
  * Contract:
  *   POST /sql   body = raw SQL text, or JSON {"sql": "..."}
  *     200 → {"columns":[...],"rows":[[...],...],"rowCount":N}
  *     4xx → {"error":"..."}   (parse/constraint violations)
  *
  * The JDK HttpServer runs requests on a single executor thread by
  * design: GraftSession is a single-session engine (its transaction
  * owner model assumes one statement stream), so serializing requests
  * is the correct concurrency model, not a limitation of the shim.
  * Result sets are collected to the driver but CAPPED at `maxRows`
  * (response carries `"truncated":true` past the cap): the entry point
  * serves interactive analytic queries whose results are aggregates; a
  * dashboard pointed at a corpus-sized SELECT must not OOM the driver.
  * Bulk export goes through COPY TO / the parquet sink instead. */
object SqlHttp {

  def start(gs: GraftSession, port: Int = 0, maxRows: Int = 10000): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val handler = new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod.toUpperCase != "POST") {
            respond(ex, 405, """{"error":"use POST /sql"}""")
          } else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
            val sql =
              if (body.startsWith("{"))
                graft.catalog.Json.parse(body).asInstanceOf[Map[String, Any]]
                  .getOrElse("sql", "").toString
              else body
            if (sql.isEmpty) respond(ex, 400, """{"error":"empty SQL"}""")
            else {
              // the session monitor is shared with PgWire.runSql: the
              // engine's transaction/publish model assumes one statement
              // stream, so an HTTP statement must not interleave with a
              // concurrently-executing wire statement (execution included —
              // MERGE's snapshot-diff cleanup would unpersist the other
              // statement's caches)
              val (cols, fetched) = gs.synchronized {
                val df = gs.sql(sql)
                // limit is pushed into the plan (TakeOrderedAndProject /
                // CollectLimit), so an unbounded SELECT ships at most
                // maxRows+1 rows to the driver, never the full corpus
                (df.columns, df.limit(maxRows + 1).collect())
              }
              val truncated = fetched.length > maxRows
              val rows = if (truncated) fetched.take(maxRows) else fetched
              val sb = new StringBuilder("{\"columns\":")
              sb.append(cols.map(jstr).mkString("[", ",", "]"))
              sb.append(",\"rows\":[")
              var first = true
              rows.foreach { r =>
                if (!first) sb.append(',')
                first = false
                sb.append(cols.indices.map(i => jval(r.get(i))).mkString("[", ",", "]"))
              }
              sb.append("],\"rowCount\":").append(rows.length)
              if (truncated) sb.append(",\"truncated\":true")
              sb.append('}')
              respond(ex, 200, sb.toString)
            }
          }
        } catch {
          case e: Exception =>
            respond(ex, 400, s"""{"error":${jstr(errMsg(e))}}""")
        }
    }
    server.createContext("/sql", handler)
    // exact-path parity with the reference's SQLController route
    // (reference SQLController.java:20-31: POST /api/sql/execute) so a
    // client ported from the reference works without reconfiguration
    server.createContext("/api/sql/execute", handler)
    server.start()
    server
  }

  private def errMsg(e: Throwable): String =
    s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Row value → JSON: native for null/boolean/numbers, arrays as JSON
    * arrays, everything else (strings, dates, timestamps, decimals
    * beyond double range) as its string form. */
  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) jstr(d.toString) else d.toString
    case f: Float => jval(f.toDouble)
    case s: collection.Seq[_] => s.map(jval).mkString("[", ",", "]")
    case other => jstr(other.toString)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
