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
  *   POST /api/sql/execute — reference-parity route serving the
  *     reference's QueryResponse shape (rows as column-keyed objects,
  *     "error":null on success, {rows:null,rowCount:0,error,columns:null}
  *     on failure); GET /api/sql/health → "OK"; the locks admin route
  *     answers the reference's non-KV-mode message.
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
    // refShape: the reference's QueryResponse serialization (reference
    // dto/QueryResponse.java via Jackson) — rows are OBJECTS keyed by
    // column name, an `error` field is present (null on success). The
    // compact /sql shape keeps positional row arrays + the truncation
    // flag. A client ported from the reference indexes rows[0]["col"],
    // so /api/sql/execute must serve the object shape to be drop-in.
    def handler(refShape: Boolean) = new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod.toUpperCase != "POST") {
            respond(ex, 405, """{"error":"use POST"}""")
          } else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
            val sql =
              if (body.startsWith("{"))
                graft.catalog.Json.parse(body).asInstanceOf[Map[String, Any]]
                  .getOrElse("sql", "").toString
              else body
            if (sql.isEmpty) respond(ex, 400, errBody(refShape, "empty SQL"))
            else {
              // the statement gate is shared with PgWire.runSql: an HTTP
              // DDL/DML's EAGER phase takes the exclusive side and
              // serializes against every other statement, while a
              // read-only statement's eager phase (plan + capped collect)
              // runs on the shared side, concurrently with other
              // readers. What the gate deliberately
              // does NOT cover is a wire SELECT's lazy result STREAMING
              // (a suspended portal pulling batches via toLocalIterator):
              // that reads an immutable copy-on-write snapshot version, so
              // a concurrent DML publishing a NEW version cannot mutate
              // the files under it — COW, not the lock, is the isolation
              // mechanism there. SELECT plans never persist RDDs, so a
              // concurrent MERGE's persistent-RDD snapshot-diff cleanup
              // has nothing of theirs to unpersist.
              val (cols, fetched) = gs.withStatementLock(sql) {
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
                if (refShape)
                  sb.append(cols.indices
                    .map(i => jstr(cols(i)) + ":" + jval(r.get(i)))
                    .mkString("{", ",", "}"))
                else
                  sb.append(cols.indices.map(i => jval(r.get(i))).mkString("[", ",", "]"))
              }
              sb.append("],\"rowCount\":").append(rows.length)
              if (refShape) sb.append(",\"error\":null")
              else if (truncated) sb.append(",\"truncated\":true")
              sb.append('}')
              respond(ex, 200, sb.toString)
            }
          }
        } catch {
          case e: Exception =>
            respond(ex, 400, errBody(refShape, errMsg(e)))
        }
    }
    server.createContext("/sql", handler(refShape = false))
    // exact parity with the reference's SQLController (reference
    // SQLController.java): POST /api/sql/execute with the QueryResponse
    // object-row shape, GET /api/sql/health → "OK", and the lock-dump
    // admin route answering exactly what the reference's non-KV mode
    // answers (Spark has no lock manager to dump)
    server.createContext("/api/sql/execute", handler(refShape = true))
    server.createContext("/api/sql/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod.toUpperCase == "GET") respondText(ex, 200, "OK")
        else respond(ex, 405, """{"error":"use GET"}""")
    })
    server.createContext("/api/sql/admin/locks/dump", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respondText(ex, 200, "Lock diagnostics not available (not in KV mode)")
    })
    server.start()
    server
  }

  private def errBody(refShape: Boolean, msg: String): String =
    if (refShape)
      // reference QueryResponse.error(message): rows/columns null,
      // rowCount 0, error populated
      s"""{"rows":null,"rowCount":0,"error":${jstr(msg)},"columns":null}"""
    else s"""{"error":${jstr(msg)}}"""

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

  private def respondText(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
